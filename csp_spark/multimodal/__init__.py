from .media import image_features, image_resize, audio_features, frame_sample
