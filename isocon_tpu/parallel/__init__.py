from .mesh import make_mesh
from .sharding import Sharder
