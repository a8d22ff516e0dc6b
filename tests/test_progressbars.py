"""Tests for progress bar display classes (mirrors mici tests/test_progressbars.py)."""

import io

import pytest

from mici_tpu import progressbars


def test_format_time():
    assert progressbars._format_time(75) == "01:15"
    assert progressbars._format_time(3675) == "1:01:15"
    assert progressbars._format_time(0) == "00:00"


def test_update_stats_running_means():
    means = {}
    progressbars._update_stats_running_means(1, means, {"a": 2.0})
    assert means["a"] == 2.0
    progressbars._update_stats_running_means(2, means, {"a": 4.0})
    assert means["a"] == 3.0
    # late-appearing key initializes rather than raising
    progressbars._update_stats_running_means(3, means, {"b": 1.0})
    assert means["b"] == 1.0


def test_sequence_progress_bar_states():
    bar = progressbars.SequenceProgressBar(range(10), "test")
    with bar:
        assert bar.counter == 0
        bar.update(5, {"accept_stat": 0.8}, refresh=False)
        assert bar.counter == 5
        assert bar.perc_complete == 50
        assert 0 < bar.prop_complete < 1
        assert "accept_stat" in bar.stats
        text = str(bar)
        assert "50%" in text
        assert "5/10" in text
        bar.update(10, refresh=False)
        assert bar.perc_complete == 100
    html = bar._repr_html_()
    assert "monospace" in html


def test_sequence_progress_bar_iteration():
    bar = progressbars.SequenceProgressBar(range(3), "iter")
    seen = []
    with bar:
        for val, b in bar:
            seen.append(val)
    assert seen == [0, 1, 2]
    assert bar.counter == 3


def test_counter_clamped():
    bar = progressbars.SequenceProgressBar(range(4), "clamp")
    bar.counter = 100
    assert bar.counter == 4
    bar.counter = -2
    assert bar.counter == 0


def test_labelled_sequence_progress_bar():
    stages = {"warm up": 1, "main": 2}
    bar = progressbars.LabelledSequenceProgressBar(stages, "Stage")
    with bar:
        assert bar.current_label == "warm up"
        bar.update(1, refresh=False)
        assert bar.current_label == "main"
        assert bar.completed_labels == ["warm up"]
        bar.update(2, refresh=False)
        assert bar.current_label == "Completed"
    assert "main" in str(bar)


def test_dummy_progress_bar():
    bar = progressbars.DummyProgressBar(range(5), "dummy")
    with bar:
        outs = [v for v, _ in bar]
    assert outs == [0, 1, 2, 3, 4]
    assert len(bar) == 5


def test_sequence_setter_guard():
    bar = progressbars.SequenceProgressBar(range(5), "guard")
    with bar:
        with pytest.raises(RuntimeError):
            bar.sequence = range(10)
    bar.sequence = range(10)
    assert bar.n_iter == 10


def test_file_display():
    buf = io.StringIO()
    display = progressbars.FileDisplay(position=(0, 2), file=buf)
    display.update("hello")
    display.update("hi")
    out = buf.getvalue()
    assert "hello" in out
    assert "hi" in out
