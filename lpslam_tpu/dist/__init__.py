from .mesh import make_mesh, default_mesh
from .sharded_ba import distributed_bundle_adjust
