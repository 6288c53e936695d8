from .structured import Mesh, square_mesh, square_with_hole_mesh
from .io import load_csv_mesh, save_csv_mesh
from .midpoints import promote, insert_midpoints_p2, insert_midpoints_p4
from .refine import refine_mesh, refine_uniform
