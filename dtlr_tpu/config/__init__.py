from .loader import Config, load_config, dump_config, parse_options

__all__ = ["Config", "load_config", "dump_config", "parse_options"]
