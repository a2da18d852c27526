from . import change_stream  # noqa: F401
from . import stateful  # noqa: F401
