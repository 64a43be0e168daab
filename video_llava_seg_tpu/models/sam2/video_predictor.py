"""SAM2VideoPredictor — streaming multi-object video segmentation.

Public API parity with sam2/sam2_video_predictor.py (init_state,
add_new_points_or_box, add_new_mask, propagate_in_video[_preflight],
reset_state, remove_object, clear_all_prompts_in_frame), rebuilt TPU-first:

- The reference assembles a variable-length memory list per frame from python
  dicts (sam2_base.py:497-674). Here the memory bank is a **fixed-capacity
  slot structure** — `num_maskmem` spatial-memory slots plus
  `max_obj_ptrs_in_encoder` object-pointer slots, each with a validity flag —
  so every tracked frame runs the same compiled program (no shape churn), and
  invalid slots are masked inside attention rather than branching.
- All per-frame compute (encode, memory attention, SAM heads, memory
  encoding) is jitted; the host only does slot bookkeeping.

Host-side session state mirrors the reference's inference_state dict so the
interaction semantics (cond vs non-cond frames, temp outputs, consolidation,
per-object slices) match exactly.
"""

from __future__ import annotations

import functools
import warnings
from collections import OrderedDict
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from video_llava_seg_tpu.data.video_io import load_video_frames
from video_llava_seg_tpu.models.sam2 import base, memory
from video_llava_seg_tpu.models.sam2.config import SAM2Config
from video_llava_seg_tpu.models.sam2.position_encoding import (
    sine_pos_embed_1d,
    sine_pos_embed_hw,
)
from video_llava_seg_tpu.ops import nn
from video_llava_seg_tpu.ops.connected_components import (
    fill_holes_and_sprinkles,
)
from video_llava_seg_tpu.ops.resize import interpolate_hw

NO_OBJ_SCORE = base.NO_OBJ_SCORE


class SAM2VideoPredictor:
    def __init__(self, params, cfg: SAM2Config,
                 fill_hole_area: float = 0.0,
                 non_overlap_masks: bool = False,
                 clear_non_cond_mem_around_input: bool = False,
                 clear_non_cond_mem_for_multi_obj: bool = False,
                 add_all_frames_to_correct_as_cond: bool = False,
                 max_cond_slots: int = 4,
                 interpret: bool = False, compute_dtype=None):
        # bf16 on TPU (sam2_video_predictor.py:952-957 runs inference in
        # bf16), fp32 elsewhere so CPU parity tests stay exact
        if compute_dtype is None:
            try:
                on_tpu = jax.devices()[0].platform in ("tpu", "axon")
            except Exception:
                on_tpu = False
            compute_dtype = jnp.bfloat16 if on_tpu else jnp.float32
        self.compute_dtype = compute_dtype
        params = jax.tree_util.tree_map(
            lambda x: x.astype(compute_dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x, params)
        self.params = params
        self.cfg = cfg
        self.fill_hole_area = fill_hole_area
        self.non_overlap_masks = non_overlap_masks
        self.clear_non_cond_mem_around_input = clear_non_cond_mem_around_input
        self.clear_non_cond_mem_for_multi_obj = clear_non_cond_mem_for_multi_obj
        self.add_all_frames_to_correct_as_cond = add_all_frames_to_correct_as_cond
        # fixed memory-slot capacity: cond slots + (num_maskmem - 1) non-cond
        self.max_cond_slots = max_cond_slots
        self.num_slots = max_cond_slots + cfg.num_maskmem - 1
        self.interpret = interpret
        self.image_size = cfg.image_size
        self.hidden_dim = cfg.hidden_dim

        self._encode_jit = jax.jit(self._encode_impl)
        self._track_jit = jax.jit(
            self._track_impl,
            static_argnames=("has_points", "use_memory", "multimask",
                             "run_mem_encoder", "is_pts"))
        self._mask_as_output_jit = jax.jit(self._mask_as_output_impl)
        self._encode_mem_jit = jax.jit(self._encode_mem_impl,
                                       static_argnames=("is_pts",))
        self._fill_holes_jit = jax.jit(self._fill_holes_impl)
        self._vidres_jit = jax.jit(self._vidres_impl,
                                   static_argnames=("hw",))
        # whole-clip lax.scan tracking (one dispatch per clip chunk);
        # covers fresh, interactive, cond-overflow, memory-clearing, and
        # uncached-feature histories — per-frame dispatch remains only for
        # degenerate configs (see _scan_eligible)
        self.use_scan_propagation = True
        self.scan_chunk = 32
        self._scan_jit = jax.jit(
            self._scan_track_impl,
            static_argnames=("reverse", "multimask", "hw", "max_ptrs"))

    @classmethod
    def from_pretrained(cls, model_id: str, **kwargs):
        from video_llava_seg_tpu.models.sam2.build import build_sam2
        params, cfg = build_sam2(model_id)
        # video predictor postprocessing defaults (build_sam.py:88-102)
        kwargs.setdefault("fill_hole_area", 8)
        kwargs.setdefault("non_overlap_masks", False)
        return cls(params, cfg, **kwargs)

    # ------------------------------------------------------------------
    # jitted compute
    # ------------------------------------------------------------------

    def _encode_impl(self, params, image):
        image = image.astype(self.compute_dtype)
        out = base.forward_image(params, self.cfg, image, self.interpret)
        feats, pos, sizes = base.prepare_backbone_features(self.cfg, out)
        return tuple(feats)

    def _track_impl(self, params, feats, coords, labels, prev_mask,
                    mem_feats, slot_tpos, slot_valid, ptrs, ptr_tpos,
                    ptr_valid, *, has_points: bool, use_memory: bool,
                    multimask: bool, run_mem_encoder: bool = False,
                    is_pts: bool = False):
        """One frame of tracking for B objects (batched along dim 0),
        optionally fused with the memory encoder (one dispatch per frame).

        feats: 3-level tuple, each [B, h, w, c]. mem_feats: either the
        stacked bank [B, S, HW, mem] or a LIST of S per-slot [B, HW, mem]
        views (concatenated in-graph — keeps slot assembly off the host);
        ptrs likewise [B, P, C] or list of P [B, C]. Invalid slots carry
        arbitrary content and are masked via slot_valid/ptr_valid."""
        cfg = self.cfg
        low = feats[-1]
        b, h, w, c = low.shape
        if isinstance(mem_feats, (list, tuple)):
            mem_feats = jnp.stack(
                [m.reshape(m.shape[0], -1, m.shape[-1]) for m in mem_feats],
                axis=1)
        if isinstance(ptrs, (list, tuple)):
            ptrs = jnp.stack(ptrs, axis=1)

        if not use_memory:
            # init cond frame: directly add no_mem_embed (sam2_base.py:653-659)
            pix = (low.reshape(b, h * w, c)
                   + params["no_mem_embed"]).reshape(b, h, w, c)
        else:
            pix = self._condition_on_memory(params, low, mem_feats, slot_tpos,
                                            slot_valid, ptrs, ptr_tpos,
                                            ptr_valid)

        outs = base.forward_sam_heads(
            params, cfg, pix,
            point_coords=coords if has_points else None,
            point_labels=labels if has_points else None,
            mask_inputs=prev_mask,
            high_res_features=list(feats[:-1]),
            multimask_output=multimask,
            interpret=self.interpret)
        (_, _, ious, low_res_masks, high_res_masks, obj_ptr,
         object_score_logits) = outs
        maskmem = None
        if run_mem_encoder and cfg.num_maskmem > 0:
            maskmem, _ = base.encode_new_memory(
                params, cfg, pix, high_res_masks, object_score_logits,
                is_mask_from_pts=is_pts)
            maskmem = maskmem.astype(jnp.bfloat16)
        # masks/scores leave the jit in fp32 (host postprocess + numpy)
        return (low_res_masks.astype(jnp.float32),
                high_res_masks.astype(jnp.float32), obj_ptr,
                object_score_logits.astype(jnp.float32), pix, maskmem)

    def _condition_on_memory(self, params, low, mem_feats, slot_tpos,
                             slot_valid, ptrs, ptr_tpos, ptr_valid):
        """Fixed-slot equivalent of _prepare_memory_conditioned_features
        (sam2_base.py:497-674): concat spatial memory slots + split object
        pointers, mask invalid slots inside attention."""
        cfg = self.cfg
        b, h, w, c = low.shape
        s_slots = mem_feats.shape[1]
        hw = h * w
        mem_dim = cfg.mem_dim
        ratio = c // mem_dim

        curr = low.reshape(b, hw, c)
        curr_pos = jnp.asarray(
            sine_pos_embed_hw(h, w, cfg.fpn.pos_num_feats), low.dtype
        ).reshape(1, hw, c)
        curr_pos = jnp.broadcast_to(curr_pos, (b, hw, c))

        # spatial memory tokens [B, S*HW, mem_dim]
        spatial = mem_feats.reshape(b, s_slots * hw, mem_dim)
        mem_pos_grid = jnp.asarray(
            sine_pos_embed_hw(h, w, cfg.memory_encoder.pos_num_feats),
            low.dtype).reshape(1, 1, hw, mem_dim)
        tpos = jnp.take(params["maskmem_tpos_enc"][:, 0, 0],
                        slot_tpos, axis=0)              # [S, mem_dim]
        spatial_pos = (mem_pos_grid + tpos[None, :, None, :]).reshape(
            1, s_slots * hw, mem_dim)
        spatial_pos = jnp.broadcast_to(spatial_pos, (b, s_slots * hw, mem_dim))

        # object pointer tokens: each ptr splits into (C/mem_dim) tokens
        p_slots = ptrs.shape[1]
        t_diff_max = max(cfg.max_obj_ptrs_in_encoder - 1, 1)
        if cfg.add_tpos_enc_to_obj_ptrs:
            tpos_dim = (cfg.hidden_dim if cfg.proj_tpos_enc_in_obj_ptrs
                        else mem_dim)
            obj_pos = sine_pos_embed_1d(
                ptr_tpos.astype(jnp.float32) / t_diff_max, tpos_dim)
            if cfg.proj_tpos_enc_in_obj_ptrs:
                obj_pos = nn.dense(params["obj_ptr_tpos_proj"], obj_pos)
        else:
            obj_pos = jnp.zeros((p_slots, mem_dim), low.dtype)
        ptr_tokens = ptrs.reshape(b, p_slots, ratio, mem_dim).reshape(
            b, p_slots * ratio, mem_dim)
        obj_pos_tokens = jnp.repeat(obj_pos, ratio, axis=0)[None]
        obj_pos_tokens = jnp.broadcast_to(obj_pos_tokens,
                                          (b, p_slots * ratio, mem_dim))

        memory_tokens = jnp.concatenate([spatial, ptr_tokens], axis=1)
        memory_pos = jnp.concatenate(
            [spatial_pos, obj_pos_tokens.astype(spatial_pos.dtype)], axis=1)

        # validity mask over kv tokens
        spatial_mask = jnp.repeat(slot_valid, hw)[None]
        ptr_mask = jnp.repeat(ptr_valid, ratio)[None]
        kv_mask = jnp.concatenate([spatial_mask, ptr_mask], axis=1)
        kv_mask = jnp.broadcast_to(kv_mask,
                                   (b, kv_mask.shape[1])).astype(bool)

        out = memory.memory_attention_apply(
            params["memory_attention"], cfg, curr, memory_tokens,
            curr_pos, memory_pos,
            num_obj_ptr_tokens=p_slots * ratio,
            interpret=self.interpret, memory_mask=kv_mask)
        return out.reshape(b, h, w, c)

    def _mask_as_output_impl(self, params, feats, mask_inputs):
        cfg = self.cfg
        low = feats[-1]
        b, h, w, c = low.shape
        pix = low  # raw features (track_step mask path skips memory)
        return base.use_mask_as_output(params, cfg, pix,
                                       list(feats[:-1]), mask_inputs)

    def _encode_mem_impl(self, params, pix_feat, high_res_masks, scores,
                         *, is_pts: bool):
        return base.encode_new_memory(params, self.cfg, pix_feat,
                                      high_res_masks, scores,
                                      is_mask_from_pts=is_pts)

    def _fill_holes_impl(self, masks):
        b, m = masks.shape[0], masks.shape[1]
        flat = masks.reshape(b * m, *masks.shape[2:])
        out = fill_holes_and_sprinkles(flat, 0.0,
                                       max_hole_area=self.fill_hole_area)
        # reference fills with 0.1 (misc.py:326); ours fills with +10 above
        # threshold; clamp to the reference's small positive value
        out = jnp.where((flat <= 0.0) & (out > 0.0), 0.1, out)
        return out.reshape(masks.shape)

    # ------------------------------------------------------------------
    # session state
    # ------------------------------------------------------------------

    def init_state(self, video_path, offload_video_to_cpu: bool = False,
                   offload_state_to_cpu: bool = False,
                   async_loading_frames: bool = False) -> Dict:
        """Load frames and build a fresh inference state
        (sam2_video_predictor.py:43-111 parity; frames can also be a
        [T, H, W, 3] uint8 ndarray)."""
        state: Dict = {}
        if async_loading_frames:
            # background-thread loader (misc.py:92-168); frames stay on
            # host and stream to device per access
            from video_llava_seg_tpu.data.video_io import AsyncFrameLoader

            loader = AsyncFrameLoader(video_path, self.image_size)
            state["images"] = loader
            video_height = loader.video_height
            video_width = loader.video_width
        elif offload_video_to_cpu:
            images, video_height, video_width = load_video_frames(
                video_path, self.image_size)
            state["images"] = np.asarray(images)  # host; moved per-frame
        else:
            images, video_height, video_width = load_video_frames(
                video_path, self.image_size)
            # device-resident frames in compute dtype (reference keeps
            # frames on GPU unless offload_video_to_cpu, :60-111)
            state["images"] = jnp.asarray(np.asarray(images),
                                          self.compute_dtype)
        state["num_frames"] = len(state["images"])
        state["video_height"] = video_height
        state["video_width"] = video_width
        state["point_inputs_per_obj"] = {}
        state["mask_inputs_per_obj"] = {}
        state["cached_features"] = {}
        state["constants"] = {}
        state["obj_id_to_idx"] = OrderedDict()
        state["obj_idx_to_id"] = OrderedDict()
        state["obj_ids"] = []
        state["output_dict"] = {"cond_frame_outputs": {},
                                "non_cond_frame_outputs": {}}
        state["output_dict_per_obj"] = {}
        state["temp_output_dict_per_obj"] = {}
        state["consolidated_frame_inds"] = {"cond_frame_outputs": set(),
                                            "non_cond_frame_outputs": set()}
        state["tracking_has_started"] = False
        state["frames_already_tracked"] = {}
        self._get_image_feature(state, 0, 1)
        return state

    def reset_state(self, state) -> None:
        self._reset_tracking_results(state)
        state["obj_id_to_idx"].clear()
        state["obj_idx_to_id"].clear()
        state["obj_ids"] = []
        state["point_inputs_per_obj"].clear()
        state["mask_inputs_per_obj"].clear()
        state["output_dict_per_obj"].clear()
        state["temp_output_dict_per_obj"].clear()

    def _reset_tracking_results(self, state) -> None:
        for v in state["point_inputs_per_obj"].values():
            v.clear()
        for v in state["mask_inputs_per_obj"].values():
            v.clear()
        for v in state["output_dict_per_obj"].values():
            v["cond_frame_outputs"].clear()
            v["non_cond_frame_outputs"].clear()
        for v in state["temp_output_dict_per_obj"].values():
            v["cond_frame_outputs"].clear()
            v["non_cond_frame_outputs"].clear()
        state["output_dict"]["cond_frame_outputs"].clear()
        state["output_dict"]["non_cond_frame_outputs"].clear()
        state["consolidated_frame_inds"]["cond_frame_outputs"].clear()
        state["consolidated_frame_inds"]["non_cond_frame_outputs"].clear()
        state["tracking_has_started"] = False
        state["frames_already_tracked"].clear()

    def _obj_id_to_idx(self, state, obj_id) -> int:
        obj_idx = state["obj_id_to_idx"].get(obj_id)
        if obj_idx is not None:
            return obj_idx
        if state["tracking_has_started"]:
            raise RuntimeError(
                f"Cannot add new object id {obj_id} after tracking starts. "
                f"All existing object ids: {state['obj_ids']}. "
                "Please call 'reset_state' to restart from scratch.")
        obj_idx = len(state["obj_id_to_idx"])
        state["obj_id_to_idx"][obj_id] = obj_idx
        state["obj_idx_to_id"][obj_idx] = obj_id
        state["obj_ids"] = list(state["obj_id_to_idx"])
        state["point_inputs_per_obj"][obj_idx] = {}
        state["mask_inputs_per_obj"][obj_idx] = {}
        state["output_dict_per_obj"][obj_idx] = {
            "cond_frame_outputs": {}, "non_cond_frame_outputs": {}}
        state["temp_output_dict_per_obj"][obj_idx] = {
            "cond_frame_outputs": {}, "non_cond_frame_outputs": {}}
        return obj_idx

    def _obj_idx_to_id(self, state, obj_idx):
        return state["obj_idx_to_id"][obj_idx]

    def _get_obj_num(self, state) -> int:
        return len(state["obj_idx_to_id"])

    def _get_image_feature(self, state, frame_idx: int, batch_size: int):
        """Per-frame feature cache (reference :879-910 keeps an LRU of 1;
        `precompute_image_features` fills the cache for a whole clip)."""
        feats = state["cached_features"].get(frame_idx)
        if feats is None:
            image = jnp.asarray(np.asarray(state["images"][frame_idx]),
                                self.compute_dtype)[None]
            feats = self._encode_jit(self.params, image)
            if not state.get("features_precomputed"):
                state["cached_features"] = {}
            state["cached_features"][frame_idx] = feats
        if batch_size > 1:
            feats = tuple(jnp.broadcast_to(f, (batch_size,) + f.shape[1:])
                          for f in feats)
        return feats

    def precompute_image_features(self, state, chunk_size: int = 8) -> None:
        """Batch the image encoder over whole chunks of the clip.

        Frame encoding has no cross-frame dependency, so running the Hiera
        trunk at batch=chunk_size amortizes kernel dispatch and feeds the
        MXU full tiles — the reference encodes per frame with a cache of 1
        (:879-910), which leaves most of the chip idle at 1024x1024."""
        n = state["num_frames"]
        imgs = state["images"]
        cache = state["cached_features"]
        todo = [i for i in range(n) if i not in cache]
        if not todo:
            return
        for s in range(0, len(todo), chunk_size):
            idxs = todo[s:s + chunk_size]
            pad = chunk_size - len(idxs)   # pad to one static batch shape
            take = idxs + [idxs[-1]] * pad
            if isinstance(imgs, jnp.ndarray):
                batch_img = imgs[jnp.asarray(take)]
            else:
                batch_img = jnp.asarray(
                    np.stack([np.asarray(imgs[i]) for i in take]),
                    self.compute_dtype)
            feats = self._encode_jit(self.params, batch_img)
            for j, fi in enumerate(idxs):
                cache[fi] = tuple(f[j:j + 1] for f in feats)
        state["features_precomputed"] = True

    # ------------------------------------------------------------------
    # memory bank assembly (host-side slot bookkeeping)
    # ------------------------------------------------------------------

    def _select_closest_cond_frames(self, frame_idx, cond_outputs, limit):
        """select_closest_cond_frames parity (sam2_utils.py:19-61)."""
        if limit == -1 or len(cond_outputs) <= limit:
            return dict(cond_outputs), {}
        assert limit >= 2
        selected = {}
        idx_before = max((t for t in cond_outputs if t < frame_idx),
                         default=None)
        if idx_before is not None:
            selected[idx_before] = cond_outputs[idx_before]
        idx_after = min((t for t in cond_outputs if t >= frame_idx),
                        default=None)
        if idx_after is not None:
            selected[idx_after] = cond_outputs[idx_after]
        remain = sorted((t for t in cond_outputs if t not in selected),
                        key=lambda x: abs(x - frame_idx))[: limit - len(selected)]
        selected.update((t, cond_outputs[t]) for t in remain)
        unselected = {t: v for t, v in cond_outputs.items()
                      if t not in selected}
        return selected, unselected

    def _assemble_memory(self, state, output_dict, frame_idx: int,
                         batch_size: int, track_in_reverse: bool):
        """Build the fixed-slot memory bank for one frame.

        Returns (mem_feats [B,S,H,W->flattened later], slot_tpos [S],
        slot_valid [S], ptrs [B,P,C], ptr_tpos [P], ptr_valid [P])."""
        cfg = self.cfg
        s = cfg.image_embedding_size
        hw = s * s
        S = self.num_slots
        P = cfg.max_obj_ptrs_in_encoder
        mem_dim = cfg.mem_dim
        C = cfg.hidden_dim

        cond_outputs = output_dict["cond_frame_outputs"]
        # max_cond_frames_in_attn == -1 means attend to ALL conditioning
        # frames (sam2_base.py select_closest_cond_frames semantics); the
        # fixed-slot bank grows in power-of-two buckets (one retrace per
        # growth) rather than silently dropping cond memories.
        limit = (len(cond_outputs) if cfg.max_cond_frames_in_attn == -1
                 else cfg.max_cond_frames_in_attn)
        selected_cond, unselected_cond = self._select_closest_cond_frames(
            frame_idx, cond_outputs, limit)
        needed = len(selected_cond) + cfg.num_maskmem - 1
        if needed > S:
            S = 1 << (needed - 1).bit_length()
            if S > self.num_slots:
                self.num_slots = S
                warnings.warn(
                    f"memory slot bank grown to {S} slots for "
                    f"{len(selected_cond)} cond frames (recompiles the "
                    "track step)", stacklevel=2)
        S = self.num_slots

        # (t_pos, out) pairs: cond frames with t_pos=0, then previous frames
        # at t_pos 1..num_maskmem-1 with temporal stride r (sam2_base:522-568)
        t_pos_and_prevs = [(0, out) for out in selected_cond.values()]
        stride = max(cfg.memory_temporal_stride_for_eval, 1)
        for t_pos in range(1, cfg.num_maskmem):
            t_rel = cfg.num_maskmem - t_pos
            if t_rel == 1:
                prev_idx = (frame_idx + 1) if track_in_reverse else (frame_idx - 1)
            else:
                if not track_in_reverse:
                    prev_idx = ((frame_idx - 2) // stride) * stride
                    prev_idx = prev_idx - (t_rel - 2) * stride
                else:
                    prev_idx = -(-(frame_idx + 2) // stride) * stride
                    prev_idx = prev_idx + (t_rel - 2) * stride
            out = output_dict["non_cond_frame_outputs"].get(prev_idx)
            if out is None:
                out = unselected_cond.get(prev_idx)
            t_pos_and_prevs.append((t_pos, out))

        # memory features stay ON DEVICE and UNSTACKED (no host round-trip,
        # no eager concat — the track jit stacks the fixed-length slot list
        # in-graph); empty slots repeat an existing view and are masked out
        # by slot_valid inside attention
        slot_feats = []
        slot_tpos = np.zeros((S,), np.int32)
        slot_valid = np.zeros((S,), bool)
        slot = 0
        for t_pos, prev in t_pos_and_prevs:
            if prev is None or slot >= S:
                continue
            # [B, H, W, mem_dim] device view, reshaped in-graph by the jit
            slot_feats.append(prev["maskmem_features"])
            slot_tpos[slot] = cfg.num_maskmem - t_pos - 1
            slot_valid[slot] = True
            slot += 1
        if not slot_feats:
            slot_feats.append(jnp.zeros((batch_size, s, s, mem_dim),
                                        self.compute_dtype))
        while len(slot_feats) < S:
            slot_feats.append(slot_feats[0])
        mem_feats = slot_feats

        # object pointers (sam2_base:591-650) — also device-resident
        ptr_list = []
        ptr_tpos = np.zeros((P,), np.float32)
        ptr_valid = np.zeros((P,), bool)
        if cfg.use_obj_ptrs_in_encoder:
            max_ptrs = min(state["num_frames"], P)
            tpos_sign_mul = -1 if track_in_reverse else 1
            if cfg.only_obj_ptrs_in_the_past_for_eval:
                ptr_cond = {t: out for t, out in selected_cond.items()
                            if (t >= frame_idx if track_in_reverse
                                else t <= frame_idx)}
            else:
                ptr_cond = selected_cond
            pos_and_ptrs = [
                ((frame_idx - t) * tpos_sign_mul
                 if cfg.use_signed_tpos_enc_to_obj_ptrs else abs(frame_idx - t),
                 out["obj_ptr"]) for t, out in ptr_cond.items()]
            for t_diff in range(1, max_ptrs):
                t = (frame_idx + t_diff if track_in_reverse
                     else frame_idx - t_diff)
                if t < 0 or t >= state["num_frames"]:
                    break
                out = output_dict["non_cond_frame_outputs"].get(
                    t, unselected_cond.get(t))
                if out is not None:
                    pos_and_ptrs.append((t_diff, out["obj_ptr"]))
            for i, (td, ptr) in enumerate(pos_and_ptrs[:P]):
                ptr_list.append(ptr)             # [B, C] device view
                ptr_tpos[i] = td
                ptr_valid[i] = True
        if not ptr_list:
            ptr_list.append(jnp.zeros((batch_size, C), self.compute_dtype))
        while len(ptr_list) < P:
            ptr_list.append(ptr_list[0])

        return (mem_feats, slot_tpos, slot_valid, ptr_list,
                ptr_tpos, ptr_valid)

    def _empty_memory(self, batch_size: int):
        """Placeholder memory args for init-cond frames (use_memory=False
        compiles its own trace, so these can be minimal)."""
        return ([jnp.zeros((1, 1, 1, 1), self.compute_dtype)],
                np.zeros((1,), np.int32), np.zeros((1,), bool),
                [jnp.zeros((1, 1), self.compute_dtype)],
                np.zeros((1,), np.float32), np.zeros((1,), bool))

    # ------------------------------------------------------------------
    # core per-frame inference
    # ------------------------------------------------------------------

    def _use_multimask(self, is_init_cond_frame: bool, point_inputs) -> bool:
        cfg = self.cfg
        num_pts = (0 if point_inputs is None
                   else point_inputs["point_labels"].shape[1])
        return (cfg.multimask_output_in_sam
                and (is_init_cond_frame or cfg.multimask_output_for_tracking)
                and (cfg.multimask_min_pt_num <= num_pts
                     <= cfg.multimask_max_pt_num))

    def _run_single_frame_inference(self, state, output_dict, frame_idx,
                                    batch_size, is_init_cond_frame,
                                    point_inputs, mask_inputs, reverse,
                                    run_mem_encoder,
                                    prev_sam_mask_logits=None):
        """Reference :912-978 parity."""
        cfg = self.cfg
        feats = self._get_image_feature(state, frame_idx, batch_size)
        assert point_inputs is None or mask_inputs is None

        if (mask_inputs is not None
                and cfg.use_mask_input_as_output_without_sam):
            outs = self._mask_as_output_jit(self.params, feats,
                                            mask_inputs)
            (_, _, _, low_res_masks, high_res_masks, obj_ptr,
             object_score_logits) = outs
            pix = feats[-1]
            maskmem = None
        else:
            if is_init_cond_frame:
                mem = self._empty_memory(batch_size)
                use_memory = False
            else:
                mem = self._assemble_memory(state, output_dict, frame_idx,
                                            batch_size, reverse)
                use_memory = True
            has_points = point_inputs is not None
            coords = (jnp.asarray(point_inputs["point_coords"]) if has_points
                      else jnp.zeros((batch_size, 1, 2)))
            labels = (jnp.asarray(point_inputs["point_labels"]) if has_points
                      else -jnp.ones((batch_size, 1), jnp.int32))
            prev_mask = None
            if prev_sam_mask_logits is not None:
                prev_mask = jnp.transpose(
                    jnp.asarray(prev_sam_mask_logits), (0, 2, 3, 1))
            multimask = self._use_multimask(is_init_cond_frame, point_inputs)
            (low_res_masks, high_res_masks, obj_ptr, object_score_logits,
             pix, maskmem) = self._track_jit(
                self.params, feats, coords, labels, prev_mask, *mem,
                has_points=has_points, use_memory=use_memory,
                multimask=multimask,
                run_mem_encoder=run_mem_encoder and cfg.num_maskmem > 0,
                is_pts=point_inputs is not None)

        if self.fill_hole_area > 0:
            low_res_masks = self._fill_holes_jit(low_res_masks)

        current_out = {
            "maskmem_features": None,
            "maskmem_pos_enc": None,
            "pred_masks": low_res_masks,
            "obj_ptr": obj_ptr,
            "object_score_logits": object_score_logits,
        }
        if run_mem_encoder and cfg.num_maskmem > 0:
            if maskmem is None:  # mask-as-output path: encode separately
                maskmem, _ = self._encode_mem_jit(
                    self.params, pix, high_res_masks, object_score_logits,
                    is_pts=point_inputs is not None)
                maskmem = maskmem.astype(jnp.bfloat16)
            current_out["maskmem_features"] = maskmem
        return current_out, low_res_masks

    def _run_memory_encoder(self, state, frame_idx, batch_size,
                            high_res_masks, object_score_logits,
                            is_mask_from_pts):
        feats = self._get_image_feature(state, frame_idx, batch_size)
        maskmem_features, _ = self._encode_mem_jit(
            self.params, feats[-1], high_res_masks, object_score_logits,
            is_pts=is_mask_from_pts)
        return maskmem_features.astype(jnp.bfloat16)

    def _get_empty_mask_ptr(self, state, frame_idx):
        """Dummy pointer from an empty mask (reference :556-590)."""
        feats = self._get_image_feature(state, frame_idx, 1)
        mask_inputs = jnp.zeros((1, self.image_size, self.image_size, 1),
                                jnp.float32)
        outs = self._mask_as_output_jit(self.params, feats, mask_inputs)
        return outs[5]

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def add_new_points_or_box(self, state, frame_idx, obj_id, points=None,
                              labels=None, clear_old_points=True,
                              normalize_coords=True, box=None):
        """Reference :173-314 parity."""
        obj_idx = self._obj_id_to_idx(state, obj_id)
        point_inputs_per_frame = state["point_inputs_per_obj"][obj_idx]
        mask_inputs_per_frame = state["mask_inputs_per_obj"][obj_idx]

        if (points is not None) != (labels is not None):
            raise ValueError("points and labels must be provided together")
        if points is None and box is None:
            raise ValueError(
                "at least one of points or box must be provided as input")
        points = (np.zeros((0, 2), np.float32) if points is None
                  else np.asarray(points, np.float32))
        labels = (np.zeros((0,), np.int32) if labels is None
                  else np.asarray(labels, np.int32))
        if points.ndim == 2:
            points = points[None]
        if labels.ndim == 1:
            labels = labels[None]
        if box is not None:
            if not clear_old_points:
                raise ValueError(
                    "cannot add box without clearing old points")
            box = np.asarray(box, np.float32).reshape(1, 2, 2)
            box_labels = np.asarray([[2, 3]], np.int32)
            points = np.concatenate([box, points], axis=1)
            labels = np.concatenate([box_labels, labels], axis=1)
        if normalize_coords:
            points = points / np.asarray(
                [state["video_width"], state["video_height"]], np.float32)
        points = points * self.image_size

        if not clear_old_points:
            old = point_inputs_per_frame.get(frame_idx)
            if old is not None:
                points = np.concatenate([old["point_coords"], points], axis=1)
                labels = np.concatenate([old["point_labels"], labels], axis=1)
        point_inputs = {"point_coords": points, "point_labels": labels}
        point_inputs_per_frame[frame_idx] = point_inputs
        mask_inputs_per_frame.pop(frame_idx, None)

        is_init_cond_frame = frame_idx not in state["frames_already_tracked"]
        reverse = (False if is_init_cond_frame
                   else state["frames_already_tracked"][frame_idx]["reverse"])
        obj_output_dict = state["output_dict_per_obj"][obj_idx]
        obj_temp = state["temp_output_dict_per_obj"][obj_idx]
        is_cond = is_init_cond_frame or self.add_all_frames_to_correct_as_cond
        storage_key = ("cond_frame_outputs" if is_cond
                       else "non_cond_frame_outputs")

        prev_sam_mask_logits = None
        prev_out = obj_temp[storage_key].get(frame_idx)
        if prev_out is None:
            prev_out = obj_output_dict["cond_frame_outputs"].get(frame_idx)
        if prev_out is None:
            prev_out = obj_output_dict["non_cond_frame_outputs"].get(frame_idx)
        if prev_out is not None and prev_out["pred_masks"] is not None:
            prev_sam_mask_logits = jnp.clip(
                jnp.asarray(prev_out["pred_masks"]), -32.0, 32.0)

        current_out, _ = self._run_single_frame_inference(
            state, obj_output_dict, frame_idx, 1, is_init_cond_frame,
            point_inputs, None, reverse, run_mem_encoder=False,
            prev_sam_mask_logits=prev_sam_mask_logits)
        obj_temp[storage_key][frame_idx] = current_out

        obj_ids = state["obj_ids"]
        consolidated = self._consolidate_temp_output_across_obj(
            state, frame_idx, is_cond=is_cond, run_mem_encoder=False,
            consolidate_at_video_res=True)
        _, video_res_masks = self._get_orig_video_res_output(
            state, consolidated["pred_masks_video_res"])
        return frame_idx, obj_ids, video_res_masks

    add_new_points = add_new_points_or_box

    def add_new_mask(self, state, frame_idx, obj_id, mask):
        """Reference :321-402 parity. mask: [H, W] bool/float."""
        obj_idx = self._obj_id_to_idx(state, obj_id)
        mask = np.asarray(mask)
        assert mask.ndim == 2
        mask_f = mask.astype(np.float32)[None, ..., None]  # [1, H, W, 1]
        if mask.shape != (self.image_size, self.image_size):
            m = interpolate_hw(jnp.asarray(mask_f[..., 0]),
                               (self.image_size, self.image_size), "bilinear",
                               antialias=True)
            mask_inputs = (np.asarray(m) >= 0.5).astype(np.float32)[..., None]
        else:
            mask_inputs = mask_f
        state["mask_inputs_per_obj"][obj_idx][frame_idx] = mask_inputs
        state["point_inputs_per_obj"][obj_idx].pop(frame_idx, None)

        is_init_cond_frame = frame_idx not in state["frames_already_tracked"]
        reverse = (False if is_init_cond_frame
                   else state["frames_already_tracked"][frame_idx]["reverse"])
        obj_output_dict = state["output_dict_per_obj"][obj_idx]
        obj_temp = state["temp_output_dict_per_obj"][obj_idx]
        is_cond = is_init_cond_frame or self.add_all_frames_to_correct_as_cond
        storage_key = ("cond_frame_outputs" if is_cond
                       else "non_cond_frame_outputs")

        current_out, _ = self._run_single_frame_inference(
            state, obj_output_dict, frame_idx, 1, is_init_cond_frame, None,
            jnp.asarray(mask_inputs), reverse, run_mem_encoder=False)
        obj_temp[storage_key][frame_idx] = current_out

        obj_ids = state["obj_ids"]
        consolidated = self._consolidate_temp_output_across_obj(
            state, frame_idx, is_cond=is_cond, run_mem_encoder=False,
            consolidate_at_video_res=True)
        _, video_res_masks = self._get_orig_video_res_output(
            state, consolidated["pred_masks_video_res"])
        return frame_idx, obj_ids, video_res_masks

    def _vidres_impl(self, masks, *, hw):
        # masks shape is static under jit, so the no-resize case folds away
        video_res = (masks if masks.shape[-2:] == hw
                     else interpolate_hw(masks, hw, "bilinear"))
        if self.non_overlap_masks:
            video_res = base.apply_non_overlapping_constraints(video_res)
        return video_res

    def _get_orig_video_res_output(self, state, any_res_masks):
        """Resize low-res mask logits to the original video resolution.

        One jitted dispatch (reference :1000-1016 does this eagerly per
        frame). The result stays DEVICE-RESIDENT, matching the reference,
        which returns GPU tensors (:1014 returns `video_res_masks` on
        `self.device`) — callers pull with np.asarray only when needed.
        On this hardware a per-frame host pull costs ~35 ms RTT + the
        transfer, which would dominate propagation."""
        h, w = state["video_height"], state["video_width"]
        video_res = self._vidres_jit(jnp.asarray(any_res_masks), hw=(h, w))
        return any_res_masks, video_res

    def _consolidate_temp_output_across_obj(self, state, frame_idx, is_cond,
                                            run_mem_encoder,
                                            consolidate_at_video_res=False):
        """Reference :426-554 parity."""
        batch_size = self._get_obj_num(state)
        storage_key = ("cond_frame_outputs" if is_cond
                       else "non_cond_frame_outputs")
        if consolidate_at_video_res:
            assert not run_mem_encoder
            ch, cw = state["video_height"], state["video_width"]
            mask_key = "pred_masks_video_res"
        else:
            ch = cw = self.image_size // 4
            mask_key = "pred_masks"

        consolidated = {
            "maskmem_features": None,
            "maskmem_pos_enc": None,
            mask_key: np.full((batch_size, 1, ch, cw), NO_OBJ_SCORE,
                              np.float32),
            "obj_ptr": np.full((batch_size, self.hidden_dim), NO_OBJ_SCORE,
                               np.float32),
            "object_score_logits": np.full((batch_size, 1), 10.0, np.float32),
        }
        empty_mask_ptr = None
        for obj_idx in range(batch_size):
            obj_temp = state["temp_output_dict_per_obj"][obj_idx]
            obj_out_dict = state["output_dict_per_obj"][obj_idx]
            out = obj_temp[storage_key].get(frame_idx)
            if out is None:
                out = obj_out_dict["cond_frame_outputs"].get(frame_idx)
            if out is None:
                out = obj_out_dict["non_cond_frame_outputs"].get(frame_idx)
            if out is None:
                if run_mem_encoder:
                    if empty_mask_ptr is None:
                        empty_mask_ptr = np.asarray(
                            self._get_empty_mask_ptr(state, frame_idx))
                    consolidated["obj_ptr"][obj_idx:obj_idx + 1] = \
                        empty_mask_ptr
                continue
            obj_mask = np.asarray(out["pred_masks"], np.float32)
            if obj_mask.shape[-2:] != (ch, cw):
                obj_mask = np.asarray(interpolate_hw(
                    jnp.asarray(obj_mask), (ch, cw), "bilinear"))
            consolidated[mask_key][obj_idx:obj_idx + 1] = obj_mask
            consolidated["obj_ptr"][obj_idx:obj_idx + 1] = np.asarray(
                out["obj_ptr"], np.float32)
            consolidated["object_score_logits"][obj_idx:obj_idx + 1] = \
                np.asarray(out["object_score_logits"], np.float32)

        if run_mem_encoder:
            high_res = interpolate_hw(
                jnp.asarray(consolidated["pred_masks"]),
                (self.image_size, self.image_size), "bilinear")
            if self.cfg.non_overlap_masks_for_mem_enc:
                high_res = base.apply_non_overlapping_constraints(high_res)
            maskmem_features = self._run_memory_encoder(
                state, frame_idx, batch_size, high_res,
                jnp.asarray(consolidated["object_score_logits"]),
                is_mask_from_pts=True)
            consolidated["maskmem_features"] = maskmem_features
        return consolidated

    def propagate_in_video_preflight(self, state):
        """Reference :592-660 parity."""
        state["tracking_has_started"] = True
        batch_size = self._get_obj_num(state)
        temp_per_obj = state["temp_output_dict_per_obj"]
        output_dict = state["output_dict"]
        consolidated_inds = state["consolidated_frame_inds"]
        for is_cond in (False, True):
            storage_key = ("cond_frame_outputs" if is_cond
                           else "non_cond_frame_outputs")
            temp_frame_inds = set()
            for obj_temp in temp_per_obj.values():
                temp_frame_inds.update(obj_temp[storage_key].keys())
            consolidated_inds[storage_key].update(temp_frame_inds)
            for frame_idx in temp_frame_inds:
                consolidated = self._consolidate_temp_output_across_obj(
                    state, frame_idx, is_cond=is_cond, run_mem_encoder=True)
                output_dict[storage_key][frame_idx] = consolidated
                self._add_output_per_object(state, frame_idx, consolidated,
                                            storage_key)
                clear = (self.clear_non_cond_mem_around_input
                         and (self.clear_non_cond_mem_for_multi_obj
                              or batch_size <= 1))
                if clear:
                    self._clear_non_cond_mem_around_input(state, frame_idx)
            for obj_temp in temp_per_obj.values():
                obj_temp[storage_key].clear()

        for frame_idx in output_dict["cond_frame_outputs"]:
            output_dict["non_cond_frame_outputs"].pop(frame_idx, None)
        for obj_out in state["output_dict_per_obj"].values():
            for frame_idx in obj_out["cond_frame_outputs"]:
                obj_out["non_cond_frame_outputs"].pop(frame_idx, None)
        for frame_idx in consolidated_inds["cond_frame_outputs"]:
            assert frame_idx in output_dict["cond_frame_outputs"]
            consolidated_inds["non_cond_frame_outputs"].discard(frame_idx)

    # ------------------------------------------------------------------
    # whole-clip scan tracking
    # ------------------------------------------------------------------

    def _scan_track_impl(self, params, feats, idxs, written0, cond_mem,
                         cond_ptrs, cond_idx, mem_ring, ptr_ring,
                         cond_sel=None, clear_mask=None, *,
                         reverse: bool, multimask: bool, hw,
                         max_ptrs: int):
        """Track a run of frames as ONE `lax.scan` dispatch.

        The reference walks frames in Python, rebuilding a ragged memory
        list per frame (sam2_video_predictor.py:662-745, sam2_base.py:
        497-674). Here propagation re-expresses that bookkeeping as index
        arithmetic inside a scan: spatial memories and object pointers
        live in fixed-size rings carried through the scan, slot selection
        is computed from the frame index, and invalid slots are masked
        inside attention. One compiled program tracks the whole chunk with
        zero host round trips.

        feats: 3-level tuple, each [T, B, h, w, c] (stacked clip features).
        idxs: [T] absolute frame indices, monotone ±1 steps but gaps are
        allowed (cond frames inside the run are skipped — the reference
        skips consolidated frames the same way).
        written0: [num_frames] bool — which frames already have a usable
        non-cond memory in the rings when the scan starts (seeded entries
        from a previous propagation pass and/or a previous chunk). The
        scan carries it and marks each tracked frame; a prev-frame lookup
        is valid iff written[prev] — the in-graph equivalent of the
        reference's `non_cond_frame_outputs.get(prev) is None` skip
        (sam2_base.py:564-570).
        cond_mem [B, Sc, HW, mem], cond_ptrs [B, Sc, C], cond_idx [Sc]:
        conditioning-frame memories (constant across the scan).
        cond_sel: optional [T, L] int32 — PER-FRAME indices into the cond
        arrays when the cond set exceeds max_cond_frames_in_attn; the
        closest-subset selection depends only on frame indices
        (sam2_utils.py:19-61), so the host precomputes it and the scan
        body gathers L of the Sc cond entries per frame. None = all cond
        frames attend every frame (the within-limit case).
        mem_ring [R, B, h, w, mem], ptr_ring [P, B, C]: carried rings
        (zeros for a fresh run; previous chunk's rings to continue).
        clear_mask: optional [T, num_frames] bool — per-step frames whose
        non-cond memory the reference would have POPPED by the time this
        step's lookups run (clear_non_cond_mem_around_input pops a window
        around each cond frame the loop crosses, sam2_video_predictor.py
        :708-712, :1155+). Applied as `written &= ~mask` BEFORE the
        lookups, exactly where the per-frame path's dict pop lands; cond
        entries ride separate arrays and are never cleared, matching the
        reference (only non_cond_frame_outputs is popped).

        Returns (mem_ring, ptr_ring, written, low_res [T, B, 1, H4, W4]
        fp32 hole-filled, vidres [T, B, 1, *hw] fp32, obj_ptr [T, B, C],
        scores [T, B, 1] fp32, maskmem [T, B, h, w, mem] bf16)."""
        cfg = self.cfg
        sc = (cond_sel.shape[1] if cond_sel is not None
              else cond_idx.shape[0])
        n_mm = cfg.num_maskmem
        stride = max(cfg.memory_temporal_stride_for_eval, 1)
        r_mem = mem_ring.shape[0]
        p_ring = ptr_ring.shape[0]
        b = cond_ptrs.shape[0]
        hgrid = mem_ring.shape[2]
        mem_dim = cfg.mem_dim
        hwgrid = hgrid * mem_ring.shape[3]
        n_frames = written0.shape[0]
        # slot tpos indices are position-fixed: cond slots at
        # num_maskmem-1, then t_pos 1..num_maskmem-1 -> num_maskmem-2..0
        slot_tpos = jnp.asarray(
            [n_mm - 1] * sc + [n_mm - p - 1 for p in range(1, n_mm)],
            jnp.int32)
        max_ptrs = min(max_ptrs, p_ring)

        def body(carry, x):
            mem_ring, ptr_ring, written = carry
            f = x["f"]
            feats_t = x["feats"]
            if clear_mask is not None:
                # memory clearing: drop availability of every frame the
                # reference would have popped before this step's lookups
                written = written & ~x["clr"]
            if cond_sel is not None:
                sel = x["sel"]
                c_mem = jnp.take(cond_mem, sel, axis=1)
                c_ptrs = jnp.take(cond_ptrs, sel, axis=1)
                c_idx = jnp.take(cond_idx, sel)
            else:
                c_mem, c_ptrs, c_idx = cond_mem, cond_ptrs, cond_idx

            def unselected_cond_at(t):
                """Is t an UNSELECTED cond frame for this step, and where
                in the cond arrays? The reference attends unselected cond
                frames as if non-cond in both the memory-slot and the
                obj-ptr lookups (sam2_base.py:564-567, 617-619)."""
                is_cond = jnp.any(cond_idx == t)
                unsel = is_cond & ~jnp.any(c_idx == t)
                return unsel, is_cond, jnp.argmax(cond_idx == t)

            def available(prev):
                # ring slots stay live for < ring-length frames, so any
                # queryable prev maps to the right slot; written[] decides
                return ((prev >= 0) & (prev < n_frames)
                        & written[jnp.clip(prev, 0, n_frames - 1)])

            def in_range(prev, f):
                return available(prev)

            # ---- spatial memory slots
            noncond_feats = []
            noncond_valid = []
            for t_pos in range(1, n_mm):
                t_rel = n_mm - t_pos
                if t_rel == 1:
                    prev = f + 1 if reverse else f - 1
                elif not reverse:
                    prev = ((f - 2) // stride) * stride - (t_rel - 2) * stride
                else:
                    prev = -(-(f + 2) // stride) * stride \
                        + (t_rel - 2) * stride
                ring_feat = mem_ring[prev % r_mem].reshape(b, hwgrid,
                                                           mem_dim)
                if cond_sel is not None:
                    unsel, is_cond, ci = unselected_cond_at(prev)
                    cond_feat = jax.lax.dynamic_index_in_dim(
                        cond_mem, ci, axis=1, keepdims=False).astype(
                        ring_feat.dtype)
                    noncond_feats.append(
                        jnp.where(unsel, cond_feat, ring_feat))
                    # selected cond frames are already attended as cond
                    # entries; their ring slot (never written) stays off
                    noncond_valid.append(
                        jnp.where(is_cond, unsel, in_range(prev, f)))
                else:
                    noncond_valid.append(in_range(prev, f))
                    noncond_feats.append(ring_feat)
            mem_feats = jnp.concatenate(
                [c_mem, jnp.stack(noncond_feats, axis=1)], axis=1)
            slot_valid = jnp.concatenate(
                [jnp.ones((sc,), bool), jnp.stack(noncond_valid)])

            # ---- object pointers: cond first, then t_diff 1..P-Sc
            # (matches the per-frame path's pos_and_ptrs[:P] truncation)
            sign = -1 if reverse else 1
            if cfg.use_signed_tpos_enc_to_obj_ptrs:
                cond_tpos = ((f - c_idx) * sign).astype(jnp.float32)
            else:
                cond_tpos = jnp.abs(f - c_idx).astype(jnp.float32)
            # cond pointer validity: the reference keeps only past cond
            # frames when only_obj_ptrs_in_the_past_for_eval (the
            # per-frame path's ptr_cond filter above)
            if cfg.only_obj_ptrs_in_the_past_for_eval:
                cond_ptr_valid = (c_idx >= f) if reverse else (c_idx <= f)
            else:
                cond_ptr_valid = jnp.ones((sc,), bool)
            nc_ptrs, nc_tpos, nc_valid = [], [], []
            for t_diff in range(1, p_ring - sc + 1):
                t = f + t_diff if reverse else f - t_diff
                valid = in_range(t, f) & (t_diff < max_ptrs)
                ring_ptr = ptr_ring[t % p_ring]
                if cond_sel is not None:
                    unsel, is_cond, ci = unselected_cond_at(t)
                    cond_ptr = jax.lax.dynamic_index_in_dim(
                        cond_ptrs, ci, axis=1, keepdims=False).astype(
                        ring_ptr.dtype)
                    ring_ptr = jnp.where(unsel, cond_ptr, ring_ptr)
                    in_bounds = ((t >= 0) & (t < n_frames)
                                 & (t_diff < max_ptrs))
                    valid = jnp.where(is_cond, unsel & in_bounds, valid)
                nc_ptrs.append(ring_ptr)
                nc_tpos.append(jnp.float32(t_diff))
                nc_valid.append(valid)
            ptrs = jnp.concatenate(
                [c_ptrs, jnp.stack(nc_ptrs, axis=1)], axis=1)
            ptr_tpos = jnp.concatenate([cond_tpos, jnp.stack(nc_tpos)])
            ptr_valid = jnp.concatenate(
                [cond_ptr_valid, jnp.stack(nc_valid)])
            if not cfg.use_obj_ptrs_in_encoder:
                ptr_valid = jnp.zeros_like(ptr_valid)

            (low_res, _high, obj_ptr, score, _pix, maskmem) = \
                self._track_impl(
                    params, feats_t,
                    jnp.zeros((b, 1, 2)), -jnp.ones((b, 1), jnp.int32),
                    None, mem_feats, slot_tpos, slot_valid, ptrs, ptr_tpos,
                    ptr_valid, has_points=False, use_memory=True,
                    multimask=multimask, run_mem_encoder=True, is_pts=False)

            mem_ring = jax.lax.dynamic_update_slice(
                mem_ring, maskmem.astype(mem_ring.dtype)[None],
                (f % r_mem, 0, 0, 0, 0))
            ptr_ring = jax.lax.dynamic_update_slice(
                ptr_ring, obj_ptr.astype(ptr_ring.dtype)[None],
                (f % p_ring, 0, 0))
            written = written.at[f].set(True)
            return (mem_ring, ptr_ring, written), (low_res, obj_ptr, score,
                                                   maskmem)

        xs = {"f": idxs, "feats": feats}
        if cond_sel is not None:
            xs["sel"] = cond_sel
        if clear_mask is not None:
            xs["clr"] = clear_mask
        (mem_ring, ptr_ring, written), (low, optr, score, maskmem) = \
            jax.lax.scan(body, (mem_ring, ptr_ring, written0), xs)

        t, _, m = low.shape[:3]
        if self.fill_hole_area > 0:
            low = self._fill_holes_impl(
                low.reshape(t * b, m, *low.shape[3:])).reshape(low.shape)
        # vmap over frames so the non-overlap constraint (when enabled)
        # stays per-frame across objects, as in the per-frame path
        vidres = jax.vmap(lambda mm: self._vidres_impl(mm, hw=hw))(low)
        return (mem_ring, ptr_ring, written, low, vidres, optr, score,
                maskmem)

    def _scan_eligible(self, state, processing_order, to_track,
                       reverse) -> bool:
        """The scan path covers both fresh and INTERACTIVE propagation
        histories: to_track may skip consolidated (cond) frames mid-run,
        and pre-existing non-cond memories from an earlier pass are seeded
        into the rings (reference semantics: the per-frame loop looks prev
        frames up in non_cond_frame_outputs and skips misses,
        sam2_base.py:564-570). Cond sets larger than the cross-attention
        limit also scan: the per-frame closest-subset selection depends
        only on frame indices (sam2_utils.py:19-61), so it precomputes on
        the host and feeds the scan as a [T, L] gather input. Memory
        clearing around inputs scans too (per-step `written` masks — the
        pop schedule depends only on frame indices), and uncached features
        are batch-encoded per chunk without retention, preserving
        precompute_chunk=0's bounded-memory intent. Remaining fallbacks
        are degenerate configs only (single frame, num_maskmem<=0,
        max_cond_frames_in_attn<2, stale object-batch seeds)."""
        if not self.use_scan_propagation or not to_track:
            return False
        if len(to_track) < 2 or self.cfg.num_maskmem <= 0:
            return False
        cond = state["output_dict"]["cond_frame_outputs"]
        limit = self.cfg.max_cond_frames_in_attn
        if limit != -1 and len(cond) > limit and limit < 2:
            # the reference asserts max_cond_frame_num >= 2
            # (sam2_utils.py:36); keep the per-frame path for degenerate
            # configs rather than diverging
            return False
        # seeded entries must have this run's object-batch size (stale
        # passes from before an add/remove_object can't be reused)
        b = self._get_obj_num(state)
        for out in state["output_dict"]["non_cond_frame_outputs"].values():
            if out["maskmem_features"].shape[0] != b:
                return False
        return True

    def _propagate_scan(self, state, to_track, reverse, crossed_cond=()):
        """Run the scan path over `to_track` (monotone frame indices, gaps
        at consolidated frames allowed), store per-frame outputs in the
        session dicts, and return the per-frame video-res masks
        (device-resident), aligned with to_track.

        crossed_cond: cond frames the per-frame loop would cross during
        this pass, in processing order — non-empty only when
        clear_non_cond_mem_around_input is active. Each crossing pops
        non-cond memories within ±stride*num_maskmem of the cond frame at
        crossing TIME (reference :708-712): entries existing then are
        gone for later lookups and from the session dicts; frames tracked
        after the crossing keep theirs. The scan reproduces the schedule
        with per-step `written` masks; the dicts get the same final state
        via (a) popping pre-existing entries in any crossed window and
        (b) not storing scan outputs for frames a LATER crossing clears."""
        cfg = self.cfg
        output_dict = state["output_dict"]
        batch_size = self._get_obj_num(state)
        hw = (state["video_height"], state["video_width"])
        s = cfg.image_embedding_size
        stride = max(cfg.memory_temporal_stride_for_eval, 1)
        r_mem = max(cfg.num_maskmem, (cfg.num_maskmem - 2) * stride + 2)
        p_ring = cfg.max_obj_ptrs_in_encoder
        n_frames = state["num_frames"]

        # memory clearing: per-step masks of frames whose non-cond memory
        # the reference has popped by this step's lookups. to_track and
        # crossed_cond are both monotone in processing order, so a
        # two-pointer walk assigns each crossing to the first tracked
        # frame AFTER it; windows accumulate (pops are permanent).
        w_clear = cfg.memory_temporal_stride_for_eval * cfg.num_maskmem
        clear_masks_np = None
        if crossed_cond:
            # masks are INCREMENTAL (only windows newly crossed before
            # this step): a frame tracked AFTER a crossing writes its ring
            # entry afterwards and must keep it, exactly as the per-frame
            # path's pop-then-track ordering does
            clear_masks_np = np.zeros((len(to_track), n_frames), bool)
            ci = 0
            for i, f in enumerate(to_track):
                while ci < len(crossed_cond) and (
                        (crossed_cond[ci] > f) if reverse
                        else (crossed_cond[ci] < f)):
                    c = crossed_cond[ci]
                    clear_masks_np[i, max(0, c - w_clear):
                                   min(n_frames, c + w_clear + 1)] = True
                    ci += 1

        cond_items = sorted(output_dict["cond_frame_outputs"].items())
        # cond overflow: precompute each frame's closest-subset selection
        # (sam2_base.py:522-527 -> sam2_utils.py:19-61) as [T, L] indices
        # into the sorted cond arrays; the scan body gathers per frame.
        # Order within a frame's subset is irrelevant (memory attention is
        # permutation-invariant over key slots; each entry carries its own
        # tpos) — keep time order for determinism.
        limit = cfg.max_cond_frames_in_attn
        cond_sel_np = None
        if limit != -1 and len(cond_items) > limit:
            pos = {t: i for i, (t, _) in enumerate(cond_items)}
            cond_map = dict(cond_items)
            cond_sel_np = np.asarray(
                [sorted(pos[t] for t in self._select_closest_cond_frames(
                    f, cond_map, limit)[0])
                 for f in to_track], np.int32)
        cond_idx = jnp.asarray([t for t, _ in cond_items], jnp.int32)
        cond_mem = jnp.stack(
            [out["maskmem_features"] for _, out in cond_items],
            axis=1).reshape(batch_size, len(cond_items), s * s, cfg.mem_dim)
        cond_ptrs = jnp.stack(
            [out["obj_ptr"] for _, out in cond_items],
            axis=1).astype(self.compute_dtype)

        mem_ring = jnp.zeros((r_mem, batch_size, s, s, cfg.mem_dim),
                             jnp.bfloat16)
        ptr_ring = jnp.zeros((p_ring, batch_size, cfg.hidden_dim),
                             self.compute_dtype)

        # seed rings + availability with pre-existing non-cond outputs the
        # run can still reference: frames within one ring length BEFORE the
        # first tracked frame (after it, in reverse). Frames >= scan_start
        # get re-tracked before any lookup reaches them, and entries past
        # the window can never be queried (max lookback < ring length), so
        # seeding exactly this window reproduces the reference's
        # dict-lookup semantics.
        scan_start = to_track[0]
        noncond = output_dict["non_cond_frame_outputs"]
        written = np.zeros((n_frames,), bool)
        if reverse:
            window = range(scan_start + 1,
                           min(n_frames, scan_start + p_ring))
        else:
            window = range(max(0, scan_start - p_ring + 1), scan_start)
        for t in window:
            out = noncond.get(t)
            if out is None:
                continue
            written[t] = True
            ptr_ring = ptr_ring.at[t % p_ring].set(
                jnp.asarray(out["obj_ptr"]).astype(self.compute_dtype))
            if abs(t - scan_start) <= r_mem - 1:
                mem_ring = mem_ring.at[t % r_mem].set(
                    jnp.asarray(out["maskmem_features"]).reshape(
                        batch_size, s, s, cfg.mem_dim).astype(jnp.bfloat16))
        written = jnp.asarray(written)

        multimask = self._use_multimask(False, None)
        cache = state["cached_features"]
        all_out = []
        for c0 in range(0, len(to_track), self.scan_chunk):
            chunk = to_track[c0:c0 + self.scan_chunk]
            # features missing from the cache (precompute_chunk=0, the
            # bounded-memory mode for very long videos) are batch-encoded
            # here and NOT retained: the scan still runs, and host memory
            # stays bounded to one scan chunk — the per-frame path would
            # encode the same frames one at a time (reference :879-910)
            missing = [f for f in chunk if f not in cache]
            ephemeral = {}
            for s2 in range(0, len(missing), 8):
                grp = missing[s2:s2 + 8]
                take = grp + [grp[-1]] * (8 - len(grp))  # static batch
                imgs = state["images"]
                if isinstance(imgs, jnp.ndarray):
                    batch_img = imgs[jnp.asarray(take)]
                else:
                    batch_img = jnp.asarray(
                        np.stack([np.asarray(imgs[i]) for i in take]),
                        self.compute_dtype)
                enc = self._encode_jit(self.params, batch_img)
                for j, fi in enumerate(grp):
                    ephemeral[fi] = tuple(f[j:j + 1] for f in enc)
            feats = []
            for lvl in range(3):
                stacked = jnp.concatenate(
                    [(cache[f] if f in cache else ephemeral[f])[lvl]
                     for f in chunk], axis=0)
                if batch_size > 1:
                    stacked = jnp.broadcast_to(
                        stacked[:, None],
                        (len(chunk), batch_size) + stacked.shape[1:])
                else:
                    stacked = stacked[:, None]
                feats.append(stacked)
            idxs = jnp.asarray(chunk, jnp.int32)
            cond_sel = (None if cond_sel_np is None
                        else jnp.asarray(cond_sel_np[c0:c0 + len(chunk)]))
            clr = (None if clear_masks_np is None
                   else jnp.asarray(clear_masks_np[c0:c0 + len(chunk)]))
            (mem_ring, ptr_ring, written, low, vidres, optr, score,
             maskmem) = self._scan_jit(
                self.params, tuple(feats), idxs, written, cond_mem,
                cond_ptrs, cond_idx, mem_ring, ptr_ring, cond_sel, clr,
                reverse=reverse, multimask=multimask, hw=hw,
                max_ptrs=min(state["num_frames"],
                             cfg.max_obj_ptrs_in_encoder))
            all_out.append((chunk, low, vidres, optr, score, maskmem))

        # dict fix-up for memory clearing: reproduce the per-frame path's
        # final dict state. (a) pre-existing non-cond entries inside ANY
        # crossed window are popped (they existed at crossing time and are
        # never re-created — unless re-tracked this pass, handled in (b));
        # (b) a frame tracked this pass keeps its output only if no LATER
        # crossing's window covers it.
        tracked = set(to_track)
        if crossed_cond:
            for t in list(noncond):
                if t in tracked:
                    continue
                if any(abs(t - c) <= w_clear for c in crossed_cond):
                    noncond.pop(t, None)
                    for obj_out in state["output_dict_per_obj"].values():
                        obj_out["non_cond_frame_outputs"].pop(t, None)

        def _cleared_later(f):
            # crossings after f's step: forward order crosses c when the
            # loop passes it, so c > f clears f's just-stored output;
            # reverse symmetric
            return any((f - w_clear <= c < f) if reverse
                       else (f < c <= f + w_clear) for c in crossed_cond)

        stacked_vidres = []
        for chunk, low, vidres, optr, score, maskmem in all_out:
            for i, f in enumerate(chunk):
                state["frames_already_tracked"][f] = {"reverse": reverse}
                stacked_vidres.append(vidres[i])
                if crossed_cond and _cleared_later(f):
                    # the per-frame path stored this output and then
                    # popped it at the later crossing; a stale entry from
                    # a previous pass goes the same way
                    noncond.pop(f, None)
                    for obj_out in state["output_dict_per_obj"].values():
                        obj_out["non_cond_frame_outputs"].pop(f, None)
                    continue
                current_out = {
                    "maskmem_features": maskmem[i],
                    "maskmem_pos_enc": None,
                    "pred_masks": low[i],
                    "obj_ptr": optr[i],
                    "object_score_logits": score[i],
                }
                noncond[f] = current_out
                self._add_output_per_object(state, f, current_out,
                                            "non_cond_frame_outputs")
        return stacked_vidres

    def propagate_in_video(self, state, start_frame_idx=None,
                           max_frame_num_to_track=None, reverse=False,
                           precompute_chunk: int = 8):
        """Reference :662-745 parity. Yields (frame_idx, obj_ids,
        video_res_masks [B, 1, H, W]) with the masks DEVICE-RESIDENT, like
        the reference's GPU-tensor yields (:743-745) — the loop issues only
        async dispatches, so the clip pipelines on-chip; call np.asarray on
        a yielded mask (or on all of them after the loop) to materialize.

        precompute_chunk > 0 batch-encodes the clip's image features up
        front (set 0 to keep the reference's one-frame LRU behavior, e.g.
        for very long videos with offloading)."""
        self.propagate_in_video_preflight(state)
        if precompute_chunk:
            self.precompute_image_features(state, precompute_chunk)
        output_dict = state["output_dict"]
        consolidated_inds = state["consolidated_frame_inds"]
        obj_ids = state["obj_ids"]
        num_frames = state["num_frames"]
        batch_size = self._get_obj_num(state)
        if len(output_dict["cond_frame_outputs"]) == 0:
            raise RuntimeError("No points are provided; please add points first")
        clear = (self.clear_non_cond_mem_around_input
                 and (self.clear_non_cond_mem_for_multi_obj
                      or batch_size <= 1))
        if start_frame_idx is None:
            start_frame_idx = min(output_dict["cond_frame_outputs"])
        if max_frame_num_to_track is None:
            max_frame_num_to_track = num_frames
        if reverse:
            end_frame_idx = max(start_frame_idx - max_frame_num_to_track, 0)
            processing_order = (range(start_frame_idx, end_frame_idx - 1, -1)
                                if start_frame_idx > 0 else [])
        else:
            end_frame_idx = min(start_frame_idx + max_frame_num_to_track,
                                num_frames - 1)
            processing_order = range(start_frame_idx, end_frame_idx + 1)

        hw = (state["video_height"], state["video_width"])
        to_track = [
            f for f in processing_order
            if f not in consolidated_inds["cond_frame_outputs"]
            and f not in consolidated_inds["non_cond_frame_outputs"]]
        if self._scan_eligible(state, processing_order, to_track, reverse):
            # whole-clip scan: one dispatch per chunk tracks to_track;
            # consolidated (stored) frames interleave in processing order.
            # With memory clearing on, every cond frame the loop crosses
            # pops a window of non-cond memories at crossing time (:1319
            # below) — the scan reproduces the pop schedule via per-step
            # written-masks and a post-hoc dict fix-up.
            crossed_cond = (
                [f for f in processing_order
                 if f in consolidated_inds["cond_frame_outputs"]]
                if clear else [])
            vidres_frames = self._propagate_scan(state, to_track, reverse,
                                                 crossed_cond)
            scan_masks = dict(zip(to_track, vidres_frames))
            for frame_idx in processing_order:
                if frame_idx in scan_masks:
                    yield frame_idx, obj_ids, scan_masks[frame_idx]
                    continue
                key = ("cond_frame_outputs"
                       if frame_idx in consolidated_inds["cond_frame_outputs"]
                       else "non_cond_frame_outputs")
                current_out = output_dict[key][frame_idx]
                self._add_output_per_object(state, frame_idx, current_out,
                                            key)
                state["frames_already_tracked"][frame_idx] = {
                    "reverse": reverse}
                yield frame_idx, obj_ids, self._vidres_jit(
                    jnp.asarray(current_out["pred_masks"]).astype(
                        jnp.float32), hw=hw)
            return

        for frame_idx in processing_order:
            if frame_idx in consolidated_inds["cond_frame_outputs"]:
                storage_key = "cond_frame_outputs"
                current_out = output_dict[storage_key][frame_idx]
                pred_masks = current_out["pred_masks"]
                if clear:
                    self._clear_non_cond_mem_around_input(state, frame_idx)
            elif frame_idx in consolidated_inds["non_cond_frame_outputs"]:
                storage_key = "non_cond_frame_outputs"
                current_out = output_dict[storage_key][frame_idx]
                pred_masks = current_out["pred_masks"]
            else:
                storage_key = "non_cond_frame_outputs"
                current_out, pred_masks = self._run_single_frame_inference(
                    state, output_dict, frame_idx, batch_size,
                    is_init_cond_frame=False, point_inputs=None,
                    mask_inputs=None, reverse=reverse, run_mem_encoder=True)
                output_dict[storage_key][frame_idx] = current_out
            self._add_output_per_object(state, frame_idx, current_out,
                                        storage_key)
            state["frames_already_tracked"][frame_idx] = {"reverse": reverse}
            video_res_masks = self._vidres_jit(
                jnp.asarray(pred_masks).astype(jnp.float32), hw=hw)
            yield frame_idx, obj_ids, video_res_masks

    def _add_output_per_object(self, state, frame_idx, current_out,
                               storage_key):
        # per-object views stay ON DEVICE (slicing a jax array is lazy; the
        # reference stores GPU tensors too — pulling to numpy here cost a
        # host round-trip per frame)
        maskmem_features = current_out["maskmem_features"]
        for obj_idx, obj_out_dict in state["output_dict_per_obj"].items():
            sl = slice(obj_idx, obj_idx + 1)
            obj_out = {
                "maskmem_features": None,
                "maskmem_pos_enc": None,
                "pred_masks": current_out["pred_masks"][sl],
                "obj_ptr": current_out["obj_ptr"][sl],
                "object_score_logits":
                    current_out["object_score_logits"][sl],
            }
            if maskmem_features is not None:
                obj_out["maskmem_features"] = maskmem_features[sl]
            obj_out_dict[storage_key][frame_idx] = obj_out

    def clear_all_prompts_in_frame(self, state, frame_idx, obj_id,
                                   need_output=True):
        """Reference :776-846 parity (simplified re-consolidation)."""
        obj_idx = self._obj_id_to_idx(state, obj_id)
        state["point_inputs_per_obj"][obj_idx].pop(frame_idx, None)
        state["mask_inputs_per_obj"][obj_idx].pop(frame_idx, None)
        temp = state["temp_output_dict_per_obj"][obj_idx]
        temp["cond_frame_outputs"].pop(frame_idx, None)
        temp["non_cond_frame_outputs"].pop(frame_idx, None)
        batch_size = self._get_obj_num(state)
        frame_has_input = any(
            frame_idx in state["point_inputs_per_obj"][i]
            or frame_idx in state["mask_inputs_per_obj"][i]
            for i in range(batch_size))
        if not frame_has_input:
            output_dict = state["output_dict"]
            state["consolidated_frame_inds"]["cond_frame_outputs"].discard(
                frame_idx)
            state["consolidated_frame_inds"]["non_cond_frame_outputs"].discard(
                frame_idx)
            out = output_dict["cond_frame_outputs"].pop(frame_idx, None)
            if out is not None:
                output_dict["non_cond_frame_outputs"][frame_idx] = out
            for obj_out in state["output_dict_per_obj"].values():
                o = obj_out["cond_frame_outputs"].pop(frame_idx, None)
                if o is not None:
                    obj_out["non_cond_frame_outputs"][frame_idx] = o
        if not need_output:
            return
        obj_ids = state["obj_ids"]
        is_cond = any(
            frame_idx in obj_temp["cond_frame_outputs"]
            for obj_temp in state["temp_output_dict_per_obj"].values())
        consolidated = self._consolidate_temp_output_across_obj(
            state, frame_idx, is_cond=is_cond, run_mem_encoder=False,
            consolidate_at_video_res=True)
        _, video_res_masks = self._get_orig_video_res_output(
            state, consolidated["pred_masks_video_res"])
        return frame_idx, obj_ids, video_res_masks

    def remove_object(self, state, obj_id, strict=False, need_output=True):
        """Reference :1041-1153 parity."""
        old_obj_idx = state["obj_id_to_idx"].get(obj_id)
        updated_frames = []
        if old_obj_idx is None:
            if strict:
                raise RuntimeError(
                    f"Cannot remove object id {obj_id} as it doesn't exist.")
            return state["obj_ids"], updated_frames

        if len(state["obj_id_to_idx"]) == 1:
            self.reset_state(state)
            return state["obj_ids"], updated_frames

        obj_input_frames = set(
            state["point_inputs_per_obj"][old_obj_idx]) | set(
            state["mask_inputs_per_obj"][old_obj_idx])
        for frame_idx in obj_input_frames:
            self.clear_all_prompts_in_frame(state, frame_idx, obj_id,
                                            need_output=False)

        old_to_new = {}
        remain = [i for i in range(len(state["obj_id_to_idx"]))
                  if i != old_obj_idx]
        for new_idx, old_idx in enumerate(remain):
            old_to_new[old_idx] = new_idx

        def remap(container):
            return {old_to_new[k]: v for k, v in container.items()
                    if k in old_to_new}

        state["obj_id_to_idx"] = OrderedDict(
            (self._obj_idx_to_id(state, old), new)
            for old, new in old_to_new.items())
        state["obj_idx_to_id"] = OrderedDict(
            (new, oid) for oid, new in state["obj_id_to_idx"].items())
        state["obj_ids"] = list(state["obj_id_to_idx"])
        state["point_inputs_per_obj"] = remap(state["point_inputs_per_obj"])
        state["mask_inputs_per_obj"] = remap(state["mask_inputs_per_obj"])
        state["output_dict_per_obj"] = remap(state["output_dict_per_obj"])
        state["temp_output_dict_per_obj"] = remap(
            state["temp_output_dict_per_obj"])

        def slice_batched(output_dict):
            keep = sorted(old_to_new.keys())
            for frame_outs in (output_dict["cond_frame_outputs"],
                               output_dict["non_cond_frame_outputs"]):
                for frame_idx, out in frame_outs.items():
                    for k in ("maskmem_features", "pred_masks", "obj_ptr",
                              "object_score_logits"):
                        if out.get(k) is not None:
                            out[k] = np.asarray(out[k])[keep]
                    updated_frames.append(frame_idx)

        slice_batched(state["output_dict"])
        return state["obj_ids"], sorted(set(updated_frames))

    def _clear_non_cond_mem_around_input(self, state, frame_idx):
        """Reference :1155+ parity."""
        r = self.cfg.memory_temporal_stride_for_eval
        frame_idx_begin = frame_idx - r * self.cfg.num_maskmem
        frame_idx_end = frame_idx + r * self.cfg.num_maskmem
        output_dict = state["output_dict"]
        non_cond = output_dict["non_cond_frame_outputs"]
        for t in range(frame_idx_begin, frame_idx_end + 1):
            non_cond.pop(t, None)
            for obj_out in state["output_dict_per_obj"].values():
                obj_out["non_cond_frame_outputs"].pop(t, None)
