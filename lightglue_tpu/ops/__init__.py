from . import assignment, attention, keypoints, rotary  # noqa: F401
