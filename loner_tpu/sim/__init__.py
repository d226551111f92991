from loner_tpu.sim.synthetic_sensors import SyntheticSensorService, SensorServer, SensorClient
