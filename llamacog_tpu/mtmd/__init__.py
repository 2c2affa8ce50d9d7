from .clip import ClipVisionModel, load_mmproj  # noqa: F401
from .mtmd import MtmdContext, MtmdChunk  # noqa: F401
