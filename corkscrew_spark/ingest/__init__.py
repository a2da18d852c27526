from . import synthetic  # noqa: F401
from . import aws_scanner  # noqa: F401
from . import k8s_scanner  # noqa: F401
from . import cloud_sources  # noqa: F401
