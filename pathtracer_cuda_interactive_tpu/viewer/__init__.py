"""Interactive remote viewer (C28-C30 capability parity)."""

from .controls import CameraController  # noqa: F401
from .server import Viewer  # noqa: F401
