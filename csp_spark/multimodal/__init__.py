from .media import (
    image_features, image_resize, audio_features, frame_sample,
    phash64, image_phash, phash_near_dups, decode_png,
)
