from loner_tpu.config.settings import Settings, load_settings, generate_options
