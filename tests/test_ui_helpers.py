"""Pure UI helper tests (parity with reference tests/test_ui_helpers.py)."""

from qwen3_tts_tpu import ui


def test_normalize_whitespace():
    assert ui.normalize_whitespace("  a\t b\n\nc  ") == "a b c"
    assert ui.normalize_whitespace("") == ""
    assert ui.normalize_whitespace("one") == "one"


def test_markup_to_ansi_strips_to_text():
    out = ui.markup_to_ansi("[accent]hello[/accent]")
    assert "hello" in out


def test_banner_prints(capsys):
    ui.print_banner()
    captured = capsys.readouterr()
    assert "QWEN3-TTS" in captured.out
