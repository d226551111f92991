from loner_tpu.runtime.trajectory_logger import TrajectoryLogger, dump_tum, load_tum
from loner_tpu.runtime.checkpoints import save_checkpoint, load_checkpoint, latest_checkpoint
