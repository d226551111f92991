from loner_tpu.data.scan import LidarScan, Frame, make_lidar_scan, sky_scan
from loner_tpu.data import synthetic
