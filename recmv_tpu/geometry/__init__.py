from . import icp, laplacian, mesh_utils, nricp, polygons
