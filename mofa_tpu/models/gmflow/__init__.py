from mofa_tpu.models.gmflow.model import GMFlow, GMFlowConfig, get_optical_flows
