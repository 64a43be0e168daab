"""Two-way transformer + mask decoder (sam2/modeling/sam/{transformer,
mask_decoder}.py parity), NHWC/functional.

The decoder prepends [obj_score, iou, 4 mask tokens] to the sparse prompts,
runs a 2-layer two-way transformer against the 64x64 image embedding, then
upscales 4x with transposed convs (fused with the high-res FPN features) and
produces masks via hypernetwork MLPs. Everything is batched static-shape; the
'best mask by IoU' selection and the stability-based multimask fallback are
jnp.where/argmax, not Python control flow."""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from video_llava_seg_tpu.models.sam2.config import SAM2Config
from video_llava_seg_tpu.ops import nn
from video_llava_seg_tpu.ops.attention import attention

_LN_EPS = 1e-5  # torch nn.LayerNorm default (two-way transformer)


# ---------------------------------------------------------------------------
# attention projections (with head-dim downsample)
# ---------------------------------------------------------------------------

def _attn_init(key, embed_dim, num_heads, downsample_rate=1, kv_in_dim=None,
               dtype=jnp.float32):
    internal = embed_dim // downsample_rate
    kv_in = kv_in_dim if kv_in_dim is not None else embed_dim
    ks = jax.random.split(key, 4)
    return {
        "q_proj": nn.dense_init(ks[0], embed_dim, internal, dtype=dtype),
        "k_proj": nn.dense_init(ks[1], kv_in, internal, dtype=dtype),
        "v_proj": nn.dense_init(ks[2], kv_in, internal, dtype=dtype),
        "out_proj": nn.dense_init(ks[3], internal, embed_dim, dtype=dtype),
    }


def _attn_apply(p, q, k, v, num_heads: int, interpret: bool = False):
    """q/k/v: [B, N, C] -> [B, Nq, C]."""
    q = nn.dense(p["q_proj"], q)
    k = nn.dense(p["k_proj"], k)
    v = nn.dense(p["v_proj"], v)
    b, nq, c = q.shape
    hd = c // num_heads
    qh = q.reshape(b, nq, num_heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(b, k.shape[1], num_heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(b, v.shape[1], num_heads, hd).transpose(0, 2, 1, 3)
    backend = "auto" if qh.shape[2] >= 256 else "xla"
    o = attention(qh, kh, vh, backend=backend, interpret=interpret)
    o = o.transpose(0, 2, 1, 3).reshape(b, nq, c)
    return nn.dense(p["out_proj"], o)


# ---------------------------------------------------------------------------
# two-way transformer
# ---------------------------------------------------------------------------

def _twoway_block_init(key, cfg: SAM2Config, dtype=jnp.float32):
    d = cfg.hidden_dim
    ks = jax.random.split(key, 5)
    return {
        "self_attn": _attn_init(ks[0], d, cfg.twoway_heads, 1, dtype=dtype),
        "norm1": nn.layer_norm_init(d, dtype),
        "cross_attn_t2i": _attn_init(ks[1], d, cfg.twoway_heads,
                                     cfg.attention_downsample_rate,
                                     dtype=dtype),
        "norm2": nn.layer_norm_init(d, dtype),
        "mlp": nn.mlp_init(ks[2], [d, cfg.twoway_mlp_dim, d], dtype=dtype),
        "norm3": nn.layer_norm_init(d, dtype),
        "norm4": nn.layer_norm_init(d, dtype),
        "cross_attn_i2t": _attn_init(ks[3], d, cfg.twoway_heads,
                                     cfg.attention_downsample_rate,
                                     dtype=dtype),
    }


def twoway_init(key, cfg: SAM2Config, dtype=jnp.float32):
    ks = jax.random.split(key, cfg.twoway_depth + 1)
    return {
        "layers": [_twoway_block_init(k, cfg, dtype) for k in
                   ks[: cfg.twoway_depth]],
        "final_attn": _attn_init(ks[-1], cfg.hidden_dim, cfg.twoway_heads,
                                 cfg.attention_downsample_rate, dtype=dtype),
        "norm_final": nn.layer_norm_init(cfg.hidden_dim, dtype),
    }


def twoway_apply(params, cfg: SAM2Config, image_embedding, image_pe,
                 point_embedding, interpret: bool = False):
    """image_embedding/image_pe: [B, N_img, C]; point_embedding: [B, Np, C].
    Returns (queries, keys)."""
    heads = cfg.twoway_heads
    queries, keys = point_embedding, image_embedding
    for i, blk in enumerate(params["layers"]):
        if i == 0:
            # skip_first_layer_pe: attn output REPLACES queries (no residual,
            # no positional terms) — transformer.py:185-187
            queries = _attn_apply(blk["self_attn"], queries, queries, queries,
                                  heads, interpret)
        else:
            q = queries + point_embedding
            queries = queries + _attn_apply(blk["self_attn"], q, q, queries,
                                            heads, interpret)
        queries = nn.layer_norm(blk["norm1"], queries, _LN_EPS)

        q = queries + point_embedding
        k = keys + image_pe
        queries = queries + _attn_apply(blk["cross_attn_t2i"], q, k, keys,
                                        heads, interpret)
        queries = nn.layer_norm(blk["norm2"], queries, _LN_EPS)

        queries = queries + nn.mlp_apply(blk["mlp"], queries)
        queries = nn.layer_norm(blk["norm3"], queries, _LN_EPS)

        q = queries + point_embedding
        k = keys + image_pe
        keys = keys + _attn_apply(blk["cross_attn_i2t"], k, q, queries, heads,
                                  interpret)
        keys = nn.layer_norm(blk["norm4"], keys, _LN_EPS)

    q = queries + point_embedding
    k = keys + image_pe
    queries = queries + _attn_apply(params["final_attn"], q, k, keys, heads,
                                    interpret)
    queries = nn.layer_norm(params["norm_final"], queries, _LN_EPS)
    return queries, keys


# ---------------------------------------------------------------------------
# mask decoder
# ---------------------------------------------------------------------------

def init(key, cfg: SAM2Config, dtype=jnp.float32):
    d = cfg.hidden_dim
    num_mask_tokens = cfg.num_multimask_outputs + 1
    ks = jax.random.split(key, 12)
    p = {
        "transformer": twoway_init(ks[0], cfg, dtype),
        "iou_token": nn.trunc_normal(ks[1], (1, d), 1.0, dtype),
        "mask_tokens": nn.trunc_normal(ks[2], (num_mask_tokens, d), 1.0,
                                       dtype),
        "output_upscaling": {
            "dc1": nn.conv_transpose2d_init(ks[3], d, d // 4, (2, 2),
                                            dtype=dtype),
            "ln": nn.layer_norm_init(d // 4, dtype),
            "dc2": nn.conv_transpose2d_init(ks[4], d // 4, d // 8, (2, 2),
                                            dtype=dtype),
        },
        "output_hypernetworks_mlps": [
            nn.mlp_init(k, [d, d, d // 8], dtype=dtype)
            for k in jax.random.split(ks[5], num_mask_tokens)
        ],
        "iou_prediction_head": nn.mlp_init(
            ks[6], [d] + [cfg.iou_head_hidden_dim] * (cfg.iou_head_depth - 1)
            + [num_mask_tokens], dtype=dtype),
    }
    if cfg.use_high_res_features_in_sam:
        p["conv_s0"] = nn.conv2d_init(ks[7], d, d // 8, (1, 1), dtype=dtype)
        p["conv_s1"] = nn.conv2d_init(ks[8], d, d // 4, (1, 1), dtype=dtype)
    if cfg.pred_obj_scores:
        p["obj_score_token"] = nn.trunc_normal(ks[9], (1, d), 1.0, dtype)
        if cfg.pred_obj_scores_mlp:
            p["pred_obj_score_head"] = nn.mlp_init(ks[10], [d, d, 1],
                                                   dtype=dtype)
        else:
            p["pred_obj_score_head"] = nn.dense_init(ks[10], d, 1,
                                                     dtype=dtype)
    return p


def predict_masks(params, cfg: SAM2Config, image_embeddings, image_pe,
                  sparse_prompt, dense_prompt,
                  high_res_features: Optional[List] = None,
                  interpret: bool = False):
    """image_embeddings/dense_prompt: [B, H, W, C] NHWC; image_pe: [H, W, C];
    sparse_prompt: [B, Np, C]. Returns (masks [B, M, 4H, 4W], iou [B, M],
    mask_tokens_out [B, M, C], object_score_logits [B, 1])."""
    b = sparse_prompt.shape[0]
    num_mask_tokens = cfg.num_multimask_outputs + 1
    tok_list = [params["iou_token"], params["mask_tokens"]]
    s = 0
    if cfg.pred_obj_scores:
        tok_list = [params["obj_score_token"]] + tok_list
        s = 1
    output_tokens = jnp.concatenate(tok_list, axis=0)
    output_tokens = jnp.broadcast_to(output_tokens[None],
                                     (b,) + output_tokens.shape)
    tokens = jnp.concatenate([output_tokens.astype(sparse_prompt.dtype),
                              sparse_prompt], axis=1)

    src = image_embeddings + dense_prompt
    h, w, c = src.shape[1], src.shape[2], src.shape[3]
    src_seq = src.reshape(b, h * w, c)
    pe_seq = jnp.broadcast_to(image_pe.reshape(1, h * w, c),
                              (b, h * w, c)).astype(src_seq.dtype)

    hs, src_out = twoway_apply(params["transformer"], cfg, src_seq, pe_seq,
                               tokens, interpret)
    iou_token_out = hs[:, s]
    mask_tokens_out = hs[:, s + 1: s + 1 + num_mask_tokens]

    src_img = src_out.reshape(b, h, w, c)
    up = params["output_upscaling"]
    x = nn.conv_transpose2d(up["dc1"], src_img, (2, 2))
    if cfg.use_high_res_features_in_sam:
        feat_s0, feat_s1 = high_res_features
        x = x + feat_s1
    x = nn.gelu(nn.layer_norm(up["ln"], x, 1e-6))
    x = nn.conv_transpose2d(up["dc2"], x, (2, 2))
    if cfg.use_high_res_features_in_sam:
        x = x + feat_s0
    upscaled = nn.gelu(x)                      # [B, 4H, 4W, C/8]

    hyper_in = jnp.stack(
        [nn.mlp_apply(mlp, mask_tokens_out[:, i])
         for i, mlp in enumerate(params["output_hypernetworks_mlps"])],
        axis=1)                                # [B, M, C/8]
    uh, uw = upscaled.shape[1], upscaled.shape[2]
    masks = jnp.einsum("bmc,bhwc->bmhw", hyper_in, upscaled,
                       preferred_element_type=jnp.float32).astype(
        upscaled.dtype)

    iou_pred = nn.mlp_apply(params["iou_prediction_head"], iou_token_out,
                            sigmoid_output=cfg.iou_prediction_use_sigmoid)
    if cfg.pred_obj_scores:
        if cfg.pred_obj_scores_mlp:
            obj = nn.mlp_apply(params["pred_obj_score_head"], hs[:, 0])
        else:
            obj = nn.dense(params["pred_obj_score_head"], hs[:, 0])
    else:
        obj = 10.0 * jnp.ones((b, 1), iou_pred.dtype)
    return masks, iou_pred, mask_tokens_out, obj


def _stability_scores(mask_logits, delta: float):
    flat = mask_logits.reshape(*mask_logits.shape[:-2], -1)
    area_i = jnp.sum(flat > delta, axis=-1).astype(jnp.float32)
    area_u = jnp.sum(flat > -delta, axis=-1).astype(jnp.float32)
    return jnp.where(area_u > 0, area_i / area_u, 1.0)


def dynamic_multimask_via_stability(cfg: SAM2Config, all_masks, all_ious):
    """Fall back from the single-mask token to the best multimask output when
    stability is low (mask_decoder.py:247-301); pure jnp."""
    multimask = all_masks[:, 1:]
    multi_iou = all_ious[:, 1:]
    best = jnp.argmax(multi_iou, axis=-1)
    bi = jnp.arange(all_masks.shape[0])
    best_masks = multimask[bi, best][:, None]
    best_ious = multi_iou[bi, best][:, None]
    single_mask = all_masks[:, 0:1]
    single_iou = all_ious[:, 0:1]
    stab = _stability_scores(single_mask,
                             cfg.dynamic_multimask_stability_delta)
    is_stable = stab >= cfg.dynamic_multimask_stability_thresh
    masks = jnp.where(is_stable[..., None, None], single_mask, best_masks)
    ious = jnp.where(is_stable, single_iou, best_ious)
    return masks, ious


def apply(params, cfg: SAM2Config, image_embeddings, image_pe, sparse_prompt,
          dense_prompt, multimask_output: bool,
          high_res_features: Optional[List] = None,
          use_dynamic_stability: bool = False, interpret: bool = False):
    """Returns (masks, iou_pred, sam_tokens_out, object_score_logits).
    multimask_output selects tokens 1..3, else token 0 (mask_decoder.py:110-175)."""
    masks, iou_pred, mask_tokens_out, obj = predict_masks(
        params, cfg, image_embeddings, image_pe, sparse_prompt, dense_prompt,
        high_res_features, interpret)
    if multimask_output:
        out_masks = masks[:, 1:]
        out_iou = iou_pred[:, 1:]
    elif use_dynamic_stability:
        out_masks, out_iou = dynamic_multimask_via_stability(cfg, masks,
                                                             iou_pred)
    else:
        out_masks = masks[:, 0:1]
        out_iou = iou_pred[:, 0:1]
    if multimask_output and cfg.use_multimask_token_for_obj_ptr:
        sam_tokens_out = mask_tokens_out[:, 1:]
    else:
        sam_tokens_out = mask_tokens_out[:, 0:1]
    return out_masks, out_iou, sam_tokens_out, obj
