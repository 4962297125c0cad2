"""Canonical flow cases (benchmark + example configurations)."""
from .cases import (circle_2d, tgv_2d, tgv_3d, sphere_3d, donut_3d,
                    oscillating_plate_2d, heaving_sphere_3d)
