"""Progress displays for chunked compiled sampling.

Covers the reference's progress-display surface (mici/progressbars.py:
sequence bars with running-mean statistics postfixes, stage-labelled bars,
ANSI multi-line file displays, notebook HTML rendering, and a queue-backed
proxy) with rendering written for this framework's execution model: the
reference updates once per Python-loop iteration, while here sampling runs
as compiled scans and the host driver reports at *chunk* granularity.
Consequences baked into the design:

- iteration rates are smoothed with an exponentially-weighted average of
  per-update deltas (chunk boundaries arrive in bursts; a global mean
  misestimates the steady rate during warm-up versus main stages);
- a bar renders in one pass from a snapshot of its state (no per-fragment
  property lattice) and is clipped to the display width;
- ``displays`` sinks are first-class: any object with an ``update``
  method receives the bar after each refresh (``FileDisplay`` for ANSI
  terminal lines, IPython display handles for notebooks, or test fakes).
"""

from __future__ import annotations

import html
import shutil
import sys
import time

_FULL_BLOCK = "█"  # one-eighth fractions are U+258F (1/8) .. U+2588


def _format_time(total_seconds):
    """Render a duration as ``[h:]mm:ss``."""
    seconds = int(total_seconds)
    if seconds >= 3600:
        return (
            f"{seconds // 3600:d}:{seconds % 3600 // 60:02d}:"
            f"{seconds % 60:02d}"
        )
    return f"{seconds // 60:02d}:{seconds % 60:02d}"


def _update_stats_running_means(iter_count, means, new_vals):
    """Fold the latest statistic values into running means in place."""
    for key, val in new_vals.items():
        if iter_count == 1 or key not in means:
            means[key] = float(val)
        else:
            means[key] += (float(val) - means[key]) / iter_count


def _bar_glyphs(fraction, width):
    """Render ``fraction`` of ``width`` columns with eighth-block glyphs."""
    fraction = min(max(fraction, 0.0), 1.0)
    n_eighths = round(fraction * width * 8)
    n_full, n_part = divmod(n_eighths, 8)
    cells = _FULL_BLOCK * n_full
    if n_part:
        # U+2590 - k is the left-(k/8)-block glyph for k in 1..8.
        cells += chr(0x2590 - n_part)
    return cells + " " * (width - len(cells))


class BaseProgressBar:
    """Interface for progress bars over a fixed-length sequence.

    Mirrors the reference protocol (mici/progressbars.py:104-184): a bar
    wraps a sequence, is used as a context manager around the loop, yields
    ``(value, bar)`` pairs on iteration and accepts ``update(iter_count,
    stats_dict)`` calls.
    """

    def __init__(self, sequence, description=None, position=(0, 1)):
        self._sequence = sequence
        self._description = description
        self._position = position
        self._active = False

    @property
    def sequence(self):
        return self._sequence

    @sequence.setter
    def sequence(self, value):
        if self._active:
            msg = "Cannot set sequence of active progress bar."
            raise RuntimeError(msg)
        self._sequence = value

    @property
    def description(self):
        return self._description

    @property
    def n_iter(self):
        return len(self._sequence)

    def __iter__(self):
        for i, val in enumerate(self._sequence):
            yield val, self
            self.update(i + 1)

    def __len__(self):
        return self.n_iter

    def update(self, iter_count, iter_dict=None, *, refresh=True):
        """Update progress bar state to reflect iteration count."""

    def __enter__(self):
        self._active = True
        self.reset()
        return self

    def __exit__(self, *args):
        self._active = False
        return False

    def reset(self):
        pass


class DummyProgressBar(BaseProgressBar):
    """Placeholder progress bar which displays nothing."""


class ProgressBar(BaseProgressBar):
    """Base class for progress bars rendering to one or more displays.

    A display sink is any object with an ``update`` method. ``FileDisplay``
    sinks receive the rendered single-line string; all other sinks (e.g.
    IPython display handles, test doubles) receive the bar object itself,
    which they can render via ``str()`` or ``_repr_html_``.  When no sinks
    are given the bar writes a carriage-returned line to ``sys.stderr``.
    """

    def __init__(self, sequence, description=None, position=(0, 1),
                 displays=None):
        super().__init__(sequence, description, position)
        self._displays = displays

    def render(self, width=None):
        """Render the bar as a single-line string of at most ``width``."""
        raise NotImplementedError

    def __str__(self):
        return self.render()

    def refresh(self):
        """Push the current state to every display sink."""
        if self._displays is None:
            width = shutil.get_terminal_size().columns
            line = self.render(width)
            sys.stderr.write("\r" + line.ljust(width))
            sys.stderr.flush()
            return
        for display in self._displays:
            if isinstance(display, FileDisplay):
                display.update(self.render())
            else:
                display.update(self)

    def _close_line(self):
        if self._displays is None:
            sys.stderr.write("\n")
            sys.stderr.flush()

    def __exit__(self, *args):
        out = super().__exit__(*args)
        self.refresh()
        self._close_line()
        return out


class SequenceProgressBar(ProgressBar):
    """Single-line progress bar with running-statistic postfix.

    Layout::

        <description> 42% |████▍     | 420/1000 [00:12<00:17, 35.2it/s,
        accept_stat=0.84]

    Covers mici/progressbars.py:200-457's role (per-stage sampling
    progress with monitored-statistic running means); rendering and rate
    estimation are this module's own (see module docstring).
    """

    def __init__(self, sequence, description=None, position=(0, 1),
                 displays=None, n_col=10, unit="it", min_refresh_time=0.25):
        super().__init__(sequence, description, position, displays)
        self._n_col = n_col
        self._unit = unit
        self._min_refresh_time = min_refresh_time
        self._counter = 0
        self._start_time = None
        self._last_refresh_time = None
        self._last_update = None  # (time, counter) of previous update
        self._ewma_rate = None  # iterations per second, smoothed
        self._stats_dict = {}

    # -- state ------------------------------------------------------------

    @property
    def counter(self):
        return self._counter

    @counter.setter
    def counter(self, value):
        self._counter = max(0, min(value, self.n_iter))

    @property
    def prop_complete(self):
        return self._counter / self.n_iter if self.n_iter else 1.0

    @property
    def perc_complete(self):
        return round(self.prop_complete * 100)

    @property
    def stats(self):
        return ", ".join(
            f"{key}={val:#.3g}" for key, val in self._stats_dict.items()
        )

    def _observe_rate(self, now):
        """Fold the latest (time, counter) delta into the smoothed rate."""
        if self._last_update is not None:
            prev_time, prev_counter = self._last_update
            dt = now - prev_time
            di = self._counter - prev_counter
            if dt > 0 and di > 0:
                inst = di / dt
                if self._ewma_rate is None:
                    self._ewma_rate = inst
                else:
                    # Smoothing constant chosen so ~5 recent updates
                    # dominate: chunked reporting arrives in bursts.
                    self._ewma_rate += 0.35 * (inst - self._ewma_rate)
        self._last_update = (now, self._counter)

    def _rate_and_eta(self):
        """Current (rate string, eta string) from the smoothed estimate."""
        rate = self._ewma_rate
        if rate is None and self._start_time is not None and self._counter:
            elapsed = time.time() - self._start_time
            rate = self._counter / elapsed if elapsed > 0 else None
        if not rate:
            return "?", "?"
        rate_str = (
            f"{rate:.2f}{self._unit}/s" if rate >= 1
            else f"{1 / rate:.2f}s/{self._unit}"
        )
        eta = _format_time((self.n_iter - self._counter) / rate)
        return rate_str, eta

    # -- rendering --------------------------------------------------------

    def render(self, width=None):
        elapsed = (
            _format_time(time.time() - self._start_time)
            if self._start_time is not None else "00:00"
        )
        rate_str, eta = self._rate_and_eta()
        head = f"{self._description}: " if self._description else ""
        tail = f", {self.stats}" if self._stats_dict else ""
        line = (
            f"{head}{self.perc_complete:3d}%"
            f"|{_bar_glyphs(self.prop_complete, self._n_col)}|"
            f"{self._counter}/{self.n_iter}"
            f" [{elapsed}<{eta}, {rate_str}{tail}]"
        )
        return line if width is None else line[:width]

    def _repr_html_(self):
        """Notebook rendering: a styled ``<progress>``-like bar."""
        pct = self.prop_complete * 100
        label = html.escape(
            f"{self._description}: " if self._description else "",
        )
        _, eta = self._rate_and_eta()
        rate_str, _ = self._rate_and_eta()
        detail = html.escape(
            f"{self._counter}/{self.n_iter} [<{eta}, {rate_str}"
            + (f", {self.stats}" if self._stats_dict else "")
            + "]",
        )
        color = "#4caf50" if self._counter == self.n_iter else "#2196f3"
        return (
            "<div style='display:flex;align-items:center;gap:0.5em;"
            "font-family:monospace'>"
            f"<span>{label}{self.perc_complete:d}%</span>"
            "<div style='flex:0 0 12em;height:1em;background:#ddd;"
            "border-radius:2px;overflow:hidden'>"
            f"<div style='width:{pct:.1f}%;height:100%;"
            f"background:{color}'></div></div>"
            f"<span>{detail}</span></div>"
        )

    # -- updates ----------------------------------------------------------

    def update(self, iter_count, iter_dict=None, *, refresh=True):
        if iter_count == 0:
            self.reset()
            return
        self.counter = iter_count
        self._observe_rate(time.time())
        if iter_dict is not None:
            _update_stats_running_means(
                iter_count, self._stats_dict, iter_dict,
            )
        if refresh:
            now = time.time()
            due = (
                self._last_refresh_time is None
                or now - self._last_refresh_time > self._min_refresh_time
                or self._counter == self.n_iter
            )
            if due:
                self.refresh()
                self._last_refresh_time = now

    def reset(self):
        self._counter = 0
        self._start_time = time.time()
        self._last_refresh_time = None
        self._last_update = None
        self._ewma_rate = None
        self._stats_dict = {}
        self.refresh()


class LabelledSequenceProgressBar(ProgressBar):
    """Progress through a labelled sequence of tasks (sampling stages).

    Renders completed labels then the current one, e.g.
    ``Stage: [warm up | main]``.
    """

    def __init__(self, labelled_sequence, description=None, position=(0, 1),
                 displays=None):
        super().__init__(
            list(labelled_sequence.values()), description, position,
            displays,
        )
        self._labels = list(labelled_sequence.keys())
        self._counter = 0

    @property
    def counter(self):
        return self._counter

    @property
    def completed_labels(self):
        return self._labels[: self._counter]

    @property
    def current_label(self):
        if self._counter < len(self._labels):
            return self._labels[self._counter]
        return "Completed"

    def render(self, width=None):
        done = ", ".join(self.completed_labels)
        sep = " | " if done else ""
        head = f"{self._description}: " if self._description else ""
        line = f"{head}[{done}{sep}{self.current_label}]"
        return line if width is None else line[:width]

    def _repr_html_(self):
        return (
            "<div style='font-family:monospace'>"
            + html.escape(self.render())
            + "</div>"
        )

    def update(self, iter_count, iter_dict=None, *, refresh=True):
        self._counter = iter_count
        if refresh:
            self.refresh()

    def reset(self):
        self._counter = 0


class FileDisplay:
    """Updatable line on a file supporting ANSI cursor-movement codes.

    ``position = (line_offset, total_lines)`` pins this display to one
    line of a ``total_lines``-tall block, so several bars (e.g. a stage
    bar plus per-stage bar) can update independently without interleaving.
    """

    _UP = "\x1b[A"
    _DOWN = "\x1b[B"

    def __init__(self, position=(0, 1), file=None):
        self._position = position
        self._file = file if file is not None else sys.stdout
        self._prev_length = 0
        if self._position[0] == 0:
            # First display of a block claims the vertical space.
            self._file.write("\n" * self._position[1])
        self._file.flush()

    def _seek_line(self, offset):
        if offset:
            code = self._DOWN if offset > 0 else self._UP
            self._file.write(code * abs(offset))

    def update(self, string):
        """Rewrite this display's line with ``string``."""
        self._seek_line(self._position[0] - self._position[1])
        self._file.write("\r" + string)
        if len(string) < self._prev_length:
            self._file.write(" " * (self._prev_length - len(string)))
        self._prev_length = len(string)
        self._seek_line(self._position[1] - self._position[0])
        self._file.flush()


class _ProxySequenceProgressBar(BaseProgressBar):
    """Forward progress updates onto a queue instead of rendering.

    Counterpart of mici/progressbars.py:712-752 for driving a
    ``SequenceProgressBar`` in another process: each ``update`` puts
    ``(job_id, iter_count, iter_dict)`` on the queue and ``__exit__``
    signals completion with ``(job_id, None, None)``.  Not used by the
    compiled samplers (chains run in one program), but available for
    host-side orchestration layers that fan sampling calls out to
    subprocesses.
    """

    def __init__(self, sequence, job_id, iter_queue):
        super().__init__(sequence, None, (0, 1))
        self._job_id = job_id
        self._iter_queue = iter_queue

    def update(self, iter_count, iter_dict=None, *, refresh=True):
        del refresh
        self._iter_queue.put((self._job_id, iter_count, iter_dict))

    def __exit__(self, *args):
        out = super().__exit__(*args)
        self._iter_queue.put((self._job_id, None, None))
        return out
