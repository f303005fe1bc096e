from mofa_tpu.models.audio.wav2vec2 import Wav2Vec2Encoder, Wav2Vec2Config
from mofa_tpu.models.audio.aniportrait import (
    Audio2Mesh, Audio2Pose, audio_to_landmarks, convert_ldmk_to_68,
    prepare_audio_feature)
