from . import synthetic  # noqa: F401
from . import aws_scanner  # noqa: F401
