from .icosphere import Icosphere, icosphere, resolution_from_nvertices
from .mesh import Mesh
