from . import errors, log
from .errors import LuminaryError
from .log import log_message, info_message, warn_message, error_message, write_log, set_verbosity, LogLevel
