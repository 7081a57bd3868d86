"""Config/registry invariants (parity with reference tests/test_config.py)."""

from qwen3_tts_tpu import config


def test_registry_keys_and_fields():
    assert set(config.MODELS) == {"1", "2", "3"}
    for key, spec in config.MODELS.items():
        assert spec.key == key
        assert spec.repo_id.count("/") == 1
        assert spec.folder
        assert spec.mode in ("custom", "design", "clone_manager")
        assert spec.output_subfolder
        assert spec.description


def test_registry_modes_are_distinct():
    modes = [s.mode for s in config.MODELS.values()]
    assert len(modes) == len(set(modes))


def test_numeric_constants():
    assert config.SAMPLE_RATE == 24_000
    assert config.MAX_TEXT_LENGTH == 10_000
    assert config.FILENAME_MAX_LEN == 20


def test_speaker_map():
    assert set(config.SPEAKER_MAP) == {"English", "Chinese", "Japanese", "Korean"}
    flat = config.all_speakers()
    assert "Ryan" in flat and "Sohee" in flat
    # de-duplicated (Vivian/Serena appear in two languages)
    assert len(flat) == len(set(flat)) == 9


def test_emotion_presets():
    assert len(config.EMOTION_PRESETS) == 6
    labels = {v[0] for v in config.EMOTION_PRESETS.values()}
    assert "Custom" in labels
    # exactly the Custom preset has no canned text
    assert sum(1 for _, t in config.EMOTION_PRESETS.values() if t is None) == 1


def test_speed_presets():
    values = {v[1] for v in config.SPEED_PRESETS.values()}
    assert values == {1.0, 1.3, 0.8}
