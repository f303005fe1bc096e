from mofa_tpu.models.cmp.model import (
    CMP, CMPConfig, TINY_CMP_CONFIG, fuser_convert_flow, cmp_preprocess,
    MotionDecoderPlain, MotionDecoderFlowNet, MotionDecoderSkipLayer,
    AlexNetFCN, cmp_config_from_yaml)
