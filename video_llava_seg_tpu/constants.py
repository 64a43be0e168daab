"""Special-token sentinels and global constants.

Capability parity with the reference's token scheme (llava/constants.py:7-21):
an out-of-vocab sentinel id marks where per-frame visual embeddings are spliced
into the token stream, IGNORE_INDEX masks labels from the CE loss, and the
[SEG] token (<vid_seg>) marks positions whose hidden states drive the
segmentation head.
"""

# Label id ignored by the cross-entropy loss (human turns, padding).
IGNORE_INDEX = -100

# Sentinel id (never a real vocab id) marking an image/frame splice position.
IMAGE_TOKEN_INDEX = -200

# Special token strings.
DEFAULT_IMAGE_TOKEN = "<image>"
DEFAULT_VIDEO_TOKEN = "<video>"
DEFAULT_IM_START_TOKEN = "<im_start>"
DEFAULT_IM_END_TOKEN = "<im_end>"
DEFAULT_IMAGE_PATCH_TOKEN = "<im_patch>"

# [SEG] token: emitted by the LLM; its hidden state prompts the seg head.
VIDEO_SEG_TOKEN = "<vid_seg>"

# Separator inserted between the slow-frame tokens and fast-frame tokens.
SLOW_FAST_SEPARATOR_TOKEN = "<sf_vid_separator>"

# Logging / misc
LOGDIR = "."
WORKER_HEART_BEAT_INTERVAL = 15
