from loner_tpu.analysis import metrics
from loner_tpu.analysis import renderer
from loner_tpu.analysis import mesher
