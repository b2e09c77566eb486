from . import mesh       # noqa: F401
from . import batch      # noqa: F401
from . import streaming  # noqa: F401
from . import session    # noqa: F401
from .session import StreamSession  # noqa: F401
