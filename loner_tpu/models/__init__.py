from loner_tpu.models.hash_encoding import HashEncodingConfig, init_hash_table, hash_encode
from loner_tpu.models.mlp import MLPConfig, init_mlp, mlp_apply
from loner_tpu.models.nerf import NeRFConfig, init_nerf, query_nerf, query_sigma
from loner_tpu.models.occupancy_grid import (
    OccGridConfig,
    init_occ_grid,
    occ_grid_interpolate,
    occupancy_probs,
)
from loner_tpu.models import sampling
from loner_tpu.models import rendering
from loner_tpu.models import losses
