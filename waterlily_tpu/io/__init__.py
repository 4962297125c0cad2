"""I/O: pytree checkpoints, VTK export/restart, residual logging."""
from .checkpoint import save_checkpoint, load_checkpoint, restart_sim
from .vtk import (VTKWriter, vtk_writer, default_attrib, write_vti, read_vti,
                  restart_from_vtk)
