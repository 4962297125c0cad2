"""Canonical flow cases (benchmark + example configurations)."""
from .cases import circle_2d, tgv_2d, sphere_3d, donut_3d, oscillating_plate_2d
