"""Env-var-driven path registry for datasets and model zoos.

Capability parity with the reference's static path registry (llava/paths.py:19-99):
dataset roots come from environment variables with repo-relative fallbacks, and
every accessor raises a clear error when the underlying directory is absent so
data-less environments fail fast instead of deep inside a loader.
"""

import os
from pathlib import Path


class Paths:
    """Static accessors for dataset/model directories.

    Env vars:
      VIDEONET_MODELS_DIR   — pretrained model zoo root
      VIDEONET_DATASETS_DIR — dataset root (default: <repo>/datasets)
    """

    @staticmethod
    def _repo_root() -> Path:
        return Path(__file__).resolve().parent.parent

    @staticmethod
    def models_dir() -> Path:
        d = os.environ.get("VIDEONET_MODELS_DIR")
        if d is None:
            raise EnvironmentError(
                "Required environment variable 'VIDEONET_MODELS_DIR' is not set"
            )
        return Path(d)

    @staticmethod
    def datasets_dir() -> Path:
        d = os.environ.get("VIDEONET_DATASETS_DIR")
        if d is not None:
            return Path(d)
        return Paths._repo_root() / "datasets"

    # ---------------- ViCaS ----------------
    @staticmethod
    def vicas_dir() -> Path:
        return Paths.datasets_dir() / "ViCaS"

    @staticmethod
    def vicas_videos_dir() -> Path:
        return Paths.vicas_dir() / "videos"

    @staticmethod
    def vicas_annotations_dir(version: str = "v0.1") -> Path:
        return Paths.vicas_dir() / "annotations" / version

    @staticmethod
    def vicas_split_json(split: str, version: str = "v0.1") -> Path:
        assert split in ("train", "val", "test"), f"bad split: {split}"
        return Paths.vicas_dir() / "splits" / version / f"{split}.json"

    @staticmethod
    def vicas_video_frames_dir() -> Path:
        return Paths.vicas_dir() / "video_frames"

    # ---------------- caption pretraining corpora ----------------
    @staticmethod
    def webvid_dir() -> Path:
        return Paths.datasets_dir() / "WebVid10M"

    @staticmethod
    def panda70m_dir() -> Path:
        return Paths.datasets_dir() / "Panda70M"

    @staticmethod
    def require(p: Path, what: str) -> Path:
        if not p.exists():
            raise FileNotFoundError(f"{what} not found at {p}")
        return p
