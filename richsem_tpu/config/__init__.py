from richsem_tpu.config.config import Config, parse_override_options

__all__ = ["Config", "parse_override_options"]
