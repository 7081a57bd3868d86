"""Sessions import without the engine loaded (parity with the reference's
lazy-import testability pattern, tests/test_sessions_smoke.py:6-11)."""

import sys


def test_sessions_import_without_engine():
    # the engine (and therefore jax) must not be imported by the session layer.
    # Stash the engine modules rather than dropping them: re-imports would
    # recreate dataclass types and break class-identity equality for any test
    # that runs after this one.
    stash = {}
    for mod in list(sys.modules):
        if mod.startswith("qwen3_tts_tpu.engine"):
            stash[mod] = sys.modules.pop(mod)
    try:
        for mod in [m for m in sys.modules if m.startswith("qwen3_tts_tpu.sessions")]:
            del sys.modules[mod]
        from qwen3_tts_tpu.sessions import (
            run_clone_manager,
            run_custom_session,
            run_design_session,
        )

        assert callable(run_custom_session)
        assert callable(run_design_session)
        assert callable(run_clone_manager)
        assert not any(m.startswith("qwen3_tts_tpu.engine") for m in sys.modules)
    finally:
        sys.modules.update(stash)


def test_app_module_importable():
    import importlib.util
    import os

    root = os.path.join(os.path.dirname(__file__), "..")
    spec = importlib.util.spec_from_file_location(
        "q3tts_app", os.path.join(root, "app.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert callable(mod.main_menu)
