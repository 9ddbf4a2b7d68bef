from .config import Config, load_config, parse_config
from .logging import create_logger, get_logger, MetricsWriter
from .meters import AverageMeter
