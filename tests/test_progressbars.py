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


def test_bar_glyphs_rendering():
    assert progressbars._bar_glyphs(0.0, 4) == "    "
    assert progressbars._bar_glyphs(1.0, 4) == "████"
    half = progressbars._bar_glyphs(0.5, 4)
    assert half.startswith("██") and len(half) == 4
    # an eighth fraction renders a partial block glyph
    partial = progressbars._bar_glyphs(1 / 32, 4)
    assert partial[0] == "▏" or partial[0] == "▎"
    # clamped outside [0, 1]
    assert progressbars._bar_glyphs(-1.0, 4) == "    "
    assert progressbars._bar_glyphs(2.0, 4) == "████"


class _FakeDisplay:
    """Display sink double recording every update it receives."""

    def __init__(self):
        self.received = []

    def update(self, value):
        self.received.append(value)


def test_displays_sinks_receive_updates():
    fake = _FakeDisplay()
    bar = progressbars.SequenceProgressBar(
        range(4), "sink", displays=[fake], min_refresh_time=0.0,
    )
    with bar:
        bar.update(1, {"a": 1.0})
        bar.update(4, {"a": 2.0})
    # reset + two updates + exit refresh
    assert len(fake.received) >= 3
    assert all(received is bar for received in fake.received)
    assert "4/4" in str(fake.received[-1])


def test_file_display_sink_receives_rendered_strings():
    buf = io.StringIO()
    display = progressbars.FileDisplay(position=(0, 1), file=buf)
    bar = progressbars.SequenceProgressBar(
        range(2), "fd", displays=[display], min_refresh_time=0.0,
    )
    with bar:
        bar.update(2)
    assert "2/2" in buf.getvalue()


def test_multi_line_file_displays_do_not_interleave():
    buf = io.StringIO()
    d0 = progressbars.FileDisplay(position=(0, 2), file=buf)
    d1 = progressbars.FileDisplay(position=(1, 2), file=buf)
    d0.update("alpha")
    d1.update("beta")
    d0.update("gamma")
    out = buf.getvalue()
    # line 0 writes move up 2 then back down 2; line 1 moves up 1/down 1
    assert out.count("\x1b[A") == out.count("\x1b[B")
    for text in ("alpha", "beta", "gamma"):
        assert text in out


def test_sequence_bar_html_has_real_bar():
    bar = progressbars.SequenceProgressBar(range(10), "html")
    with bar:
        bar.update(5, refresh=False)
        html_repr = bar._repr_html_()
    assert "width:50.0%" in html_repr
    assert "html" in html_repr


def test_labelled_bar_html():
    bar = progressbars.LabelledSequenceProgressBar({"a": 1, "b": 2})
    html_repr = bar._repr_html_()
    assert "monospace" in html_repr and "a" in html_repr


def test_proxy_progress_bar_puts_updates_on_queue():
    import queue

    q = queue.Queue()
    bar = progressbars._ProxySequenceProgressBar(range(3), 7, q)
    with bar:
        bar.update(1, {"x": 1.0})
        bar.update(3)
    items = []
    while not q.empty():
        items.append(q.get())
    assert items[0] == (7, 1, {"x": 1.0})
    assert items[1] == (7, 3, None)
    assert items[-1] == (7, None, None)


def test_rate_estimate_appears_after_updates():
    bar = progressbars.SequenceProgressBar(
        range(100), "rate", min_refresh_time=0.0, displays=[],
    )
    with bar:
        bar.update(10)
        bar.update(50)
        text = str(bar)
    assert "it/s" in text or "s/it" in text
