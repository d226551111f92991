from loner_tpu.geometry import se3
from loner_tpu.geometry.world_cube import WorldCube, compute_world_cube
from loner_tpu.geometry import rays
from loner_tpu.geometry import motion
