from . import acs         # noqa: F401
from . import traceback   # noqa: F401
