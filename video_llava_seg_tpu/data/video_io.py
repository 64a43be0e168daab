"""Video frame loading (decord-free).

Capability parity with sam2/utils/misc.py:92-309 (JPEG-folder and mp4 loaders
with resize + mean/std normalize) and
llava/model/multimodal_encoder/clip_video_processor.py:31-44 (uniform
linspace frame sampling from mp4 bytes/paths). decord is not available in
this environment; mp4 decode uses OpenCV, JPEG folders use PIL. Decode stays
on host; resize/normalize runs on device inside jitted preprocessing."""

from __future__ import annotations

import io
import os
import tempfile
from typing import List, Optional, Tuple, Union

import numpy as np


IMG_MEAN = (0.485, 0.456, 0.406)
IMG_STD = (0.229, 0.224, 0.225)


def _cv2():
    import cv2
    return cv2


def read_video_frames_cv2(path_or_bytes: Union[str, bytes],
                          indices: Optional[np.ndarray] = None):
    """Decode frames from an mp4 (path or raw bytes) as RGB uint8 arrays.

    Returns (frames [T, H, W, 3], total_frames, fps)."""
    cv2 = _cv2()
    tmp = None
    path = path_or_bytes
    if isinstance(path_or_bytes, bytes):
        tmp = tempfile.NamedTemporaryFile(suffix=".mp4", delete=False)
        tmp.write(path_or_bytes)
        tmp.flush()
        path = tmp.name
    try:
        cap = cv2.VideoCapture(path)
        if not cap.isOpened():
            raise IOError(f"cannot open video: {path!r}")
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
        frames = []
        if indices is None:
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        else:
            want = set(int(i) for i in indices)
            hi = max(want) if want else -1
            i = 0
            got = {}
            while i <= hi:
                ok, frame = cap.read()
                if not ok:
                    break
                if i in want:
                    got[i] = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                i += 1
            frames = [got[int(i)] for i in indices if int(i) in got]
        cap.release()
        return np.stack(frames) if frames else np.zeros((0, 0, 0, 3), np.uint8), total, fps
    finally:
        if tmp is not None:
            tmp.close()
            os.unlink(tmp.name)


def sample_frame_indices(total_frames: int, num_frames: int) -> np.ndarray:
    """Uniform linspace sampling (clip_video_processor.py:31-44 semantics)."""
    if total_frames <= 0:
        return np.zeros((0,), np.int64)
    return np.linspace(0, total_frames - 1, num_frames).round().astype(np.int64)


def load_video_uniform(path_or_bytes, num_frames: int,
                       return_timestamps: bool = False):
    """Decode `num_frames` uniformly-sampled RGB frames from an mp4."""
    # first probe total frames
    cv2 = _cv2()
    tmp = None
    path = path_or_bytes
    if isinstance(path_or_bytes, bytes):
        tmp = tempfile.NamedTemporaryFile(suffix=".mp4", delete=False)
        tmp.write(path_or_bytes)
        tmp.flush()
        path = tmp.name
    try:
        cap = cv2.VideoCapture(path)
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        cap.release()
        idx = sample_frame_indices(total, num_frames)
        frames, total, fps = read_video_frames_cv2(path, idx)
        if return_timestamps:
            ts = idx.astype(np.float64) / max(total - 1, 1)
            return frames, ts
        return frames
    finally:
        if tmp is not None:
            tmp.close()
            os.unlink(tmp.name)


def load_frames_from_jpg_dir(dir_path: str):
    """Load '<idx>.jpg' frames (sam2/utils/misc.py:219+ semantics).

    Returns (list of RGB uint8 [H, W, 3] at original size, height, width)."""
    from PIL import Image

    names = [p for p in os.listdir(dir_path)
             if os.path.splitext(p)[-1].lower() in (".jpg", ".jpeg", ".png")]
    names.sort(key=lambda p: int(os.path.splitext(p)[0]))
    if not names:
        raise RuntimeError(f"no images found in {dir_path}")
    frames = []
    h = w = None
    for n in names:
        img = Image.open(os.path.join(dir_path, n)).convert("RGB")
        if h is None:
            w, h = img.size
        frames.append(np.asarray(img))
    return frames, h, w


def load_video_frames(video_path, image_size: int):
    """SAM2-video-predictor loader parity: mp4 path/bytes, JPEG dir, or a
    pre-decoded [T, H, W, 3] uint8 array.

    Returns (frames_resized [T, S, S, 3] float32 normalized, video_h, video_w)."""
    from PIL import Image

    if isinstance(video_path, np.ndarray):
        frames = list(video_path)
        h, w = frames[0].shape[:2]
    elif isinstance(video_path, bytes) or (
            isinstance(video_path, str)
            and os.path.splitext(video_path)[-1].lower() == ".mp4"):
        arr, _, _ = read_video_frames_cv2(video_path)
        frames = list(arr)
        h, w = frames[0].shape[:2]
    elif isinstance(video_path, str) and os.path.isdir(video_path):
        frames, h, w = load_frames_from_jpg_dir(video_path)
    else:
        raise NotImplementedError(
            "Only MP4, JPEG folder, or ndarray inputs are supported")

    mean = np.asarray(IMG_MEAN, np.float32)
    std = np.asarray(IMG_STD, np.float32)
    out = np.empty((len(frames), image_size, image_size, 3), np.float32)
    for i, f in enumerate(frames):
        # PIL resize for parity with the reference's frame loader
        img = Image.fromarray(f).resize((image_size, image_size))
        out[i] = (np.asarray(img, np.float32) / 255.0 - mean) / std
    return out, h, w


class AsyncFrameLoader:
    """Background-thread frame loader (sam2/utils/misc.py:92-168
    AsyncVideoFrameLoader semantics): frame 0 is loaded synchronously so
    shape/dtype are known, the rest stream in a daemon thread; __getitem__
    blocks until the requested frame is ready.

    Supports indexing and len(); `shape` mirrors the eager array."""

    def __init__(self, video_path, image_size: int):
        import threading

        # decode everything to raw frames first is what the sync path does;
        # here we decode lazily: resolve the source once, then normalize
        # per-frame in the worker
        raw, self.video_height, self.video_width = _load_raw_frames(
            video_path)
        self._raw = raw
        self.image_size = image_size
        n = len(raw)
        self._frames = [None] * n
        self._frames[0] = _normalize_frame(raw[0], image_size)
        self._exception = None
        self._done = threading.Event()

        def worker():
            try:
                for i in range(1, n):
                    self._frames[i] = _normalize_frame(raw[i], image_size)
            except Exception as exc:   # surfaced on next access
                self._exception = exc
            finally:
                self._done.set()

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    @property
    def shape(self):
        return (len(self._frames), self.image_size, self.image_size, 3)

    def __len__(self):
        return len(self._frames)

    def __getitem__(self, index):
        if self._exception is not None:
            raise RuntimeError("async frame loading failed") \
                from self._exception
        while self._frames[index] is None:
            self._done.wait(0.01)
            if self._exception is not None:
                raise RuntimeError("async frame loading failed") \
                    from self._exception
        return self._frames[index]


def _load_raw_frames(video_path):
    """Resolve mp4/JPEG-dir/ndarray to raw uint8 frames + original size."""
    if isinstance(video_path, np.ndarray):
        frames = list(video_path)
        return frames, frames[0].shape[0], frames[0].shape[1]
    if isinstance(video_path, bytes) or (
            isinstance(video_path, str)
            and os.path.splitext(video_path)[-1].lower() == ".mp4"):
        arr, _, _ = read_video_frames_cv2(video_path)
        frames = list(arr)
        return frames, frames[0].shape[0], frames[0].shape[1]
    if isinstance(video_path, str) and os.path.isdir(video_path):
        return load_frames_from_jpg_dir(video_path)
    raise NotImplementedError(
        "Only MP4, JPEG folder, or ndarray inputs are supported")


def _normalize_frame(frame: np.ndarray, image_size: int) -> np.ndarray:
    """Resize + 1/255 + mean/std for one frame (sync-loader semantics)."""
    from PIL import Image

    mean = np.asarray(IMG_MEAN, np.float32)
    std = np.asarray(IMG_STD, np.float32)
    img = Image.fromarray(frame).resize((image_size, image_size))
    return ((np.asarray(img, np.float32) / 255.0 - mean) / std)
