from mofa_tpu.core.dtypes import Policy, DEFAULT_POLICY
from mofa_tpu.core.mesh import make_mesh, MeshAxes
