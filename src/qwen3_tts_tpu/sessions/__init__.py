"""Session flows for the three modes (facade — reference
/root/reference/src/qwen3_tts/sessions/__init__.py:1-7)."""

from .custom import run_custom_session  # noqa: F401
from .design import run_design_session  # noqa: F401
from .clone import run_clone_manager  # noqa: F401
