"""Progress bar classes for tracking progress of chains.

Reference: mici/progressbars.py (752 LoC).  The reference renders per-chain
progress from a Python-level iteration loop (including a cross-process
proxy, mici/progressbars.py:712-752); here sampling runs as compiled scans
so progress is reported at *chunk* granularity from the host driver loop.
The class names and context-manager/iteration protocols are kept for API
parity; the cross-process proxy is unnecessary (no worker processes) and is
aliased to the in-process bar.
"""

from __future__ import annotations

import html
import shutil
import sys
import time


def _format_time(total_seconds):
    """Format a time interval in seconds as a colon-delimited string [h:]m:s.

    Reference: mici/progressbars.py:24-36.
    """
    total_mins, seconds = divmod(int(total_seconds), 60)
    hours, mins = divmod(total_mins, 60)
    if hours != 0:
        return f"{hours:d}:{mins:02d}:{seconds:02d}"
    return f"{mins:02d}:{seconds:02d}"


def _update_stats_running_means(iter_count, means, new_vals):
    """Update dictionary of running statistics means with latest values.

    Reference: mici/progressbars.py:91-101.
    """
    for key, val in new_vals.items():
        if iter_count == 1 or key not in means:
            means[key] = float(val)
        else:
            means[key] += (float(val) - means[key]) / iter_count


class BaseProgressBar:
    """Base class defining expected interface for progress bars.

    Reference: mici/progressbars.py:104-184.
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
    """Placeholder progress bar with no display.

    Reference: mici/progressbars.py:187-197.
    """


class ProgressBar(BaseProgressBar):
    """Base class for progress bars displaying progress to streams."""


class SequenceProgressBar(ProgressBar):
    """Terminal progress bar for tracking progress through a sequence.

    Reference: mici/progressbars.py:200-457 (glyph-based terminal bar with
    running-mean statistics postfix).
    """

    GLYPHS = " ▏▎▍▌▋▊▉█"

    def __init__(self, sequence, description=None, position=(0, 1),
                 displays=None, n_col=10, unit="it", min_refresh_time=0.25):
        super().__init__(sequence, description, position)
        self._n_col = n_col
        self._unit = unit
        self._min_refresh_time = min_refresh_time
        self._displays = displays
        self._counter = 0
        self._start_time = None
        self._last_refresh_time = None
        self._stats_dict = {}

    @property
    def description(self):
        return self._description

    @property
    def counter(self):
        return self._counter

    @counter.setter
    def counter(self, value):
        self._counter = max(0, min(value, self.n_iter))

    @property
    def prop_complete(self):
        return self.counter / self.n_iter if self.n_iter else 1.0

    @property
    def perc_complete(self):
        return int(round(self.prop_complete * 100))

    @property
    def elapsed_time(self):
        if self._start_time is None:
            return "00:00"
        return _format_time(time.time() - self._start_time)

    @property
    def iter_rate(self):
        if self._start_time is None or self.counter == 0:
            return "?"
        mean_time = (time.time() - self._start_time) / self.counter
        if mean_time < 1:
            return f"{1 / mean_time:.2f}{self._unit}/s"
        return f"{mean_time:.2f}s/{self._unit}"

    @property
    def est_remaining_time(self):
        if self._start_time is None or self.counter == 0:
            return "?"
        mean_time = (time.time() - self._start_time) / self.counter
        return _format_time((self.n_iter - self.counter) * mean_time)

    @property
    def n_block_filled(self):
        return int(self._n_col * self.prop_complete)

    @property
    def n_block_empty(self):
        return self._n_col - self.n_block_filled

    @property
    def prop_partial_block(self):
        return self._n_col * self.prop_complete - self.n_block_filled

    @property
    def filled_blocks(self):
        return self.GLYPHS[-1] * self.n_block_filled

    @property
    def empty_blocks(self):
        if self.prop_partial_block == 0:
            return self.GLYPHS[0] * self.n_block_empty
        return self.GLYPHS[0] * (self.n_block_empty - 1)

    @property
    def partial_block(self):
        if self.prop_partial_block == 0:
            return ""
        index = int(len(self.GLYPHS) * self.prop_partial_block)
        return self.GLYPHS[index]

    @property
    def progress_bar(self):
        return f"|{self.filled_blocks}{self.partial_block}{self.empty_blocks}|"

    @property
    def bar_color(self):
        if self.counter == self.n_iter:
            return "green"
        if self._active:
            return "blue"
        return "red"

    @property
    def stats(self):
        return ", ".join(
            f"{key}={val:#.3g}" for key, val in self._stats_dict.items()
        )

    @property
    def prefix(self):
        return (
            f"{self._description + ': ' if self._description else ''}"
            f"{self.perc_complete:3d}%"
        )

    @property
    def postfix(self):
        return (
            f"{self.counter}/{self.n_iter} "
            f"[{self.elapsed_time}<{self.est_remaining_time}, "
            f"{self.iter_rate}"
            f"{', ' + self.stats if self._stats_dict else ''}]"
        )

    def __str__(self):
        return f"{self.prefix}{self.progress_bar}{self.postfix}"

    def _repr_html_(self):
        return (
            "<div style='font-family: monospace'>"
            + html.escape(str(self))
            + "</div>"
        )

    def update(self, iter_count, iter_dict=None, *, refresh=True):
        if iter_count == 0:
            self.reset()
        else:
            self.counter = iter_count
            if iter_dict is not None:
                _update_stats_running_means(
                    iter_count, self._stats_dict, iter_dict,
                )
            if refresh:
                now = time.time()
                should = (
                    self._last_refresh_time is None
                    or now - self._last_refresh_time
                    > self._min_refresh_time
                    or self.counter == self.n_iter
                )
                if should:
                    self.refresh()
                    self._last_refresh_time = now

    def reset(self):
        self._counter = 0
        self._start_time = time.time()
        self._last_refresh_time = None
        self._stats_dict = {}
        self.refresh()

    def refresh(self):
        if self._displays is None:
            width = shutil.get_terminal_size().columns
            line = str(self)[:width]
            sys.stderr.write("\r" + line + " " * max(0, width - len(line)))
            sys.stderr.flush()

    def __exit__(self, *args):
        out = super().__exit__(*args)
        self.refresh()
        if self._displays is None:
            sys.stderr.write("\n")
            sys.stderr.flush()
        return out


class LabelledSequenceProgressBar(ProgressBar):
    """Progress bar for a labelled sequence of tasks (sampling stages).

    Reference: mici/progressbars.py:458-663.
    """

    def __init__(self, labelled_sequence, description=None, position=(0, 1)):
        sequence = list(labelled_sequence.values())
        super().__init__(sequence, description, position)
        self._labels = list(labelled_sequence.keys())
        self._counter = 0

    @property
    def completed_labels(self):
        return self._labels[:self._counter]

    @property
    def current_label(self):
        if self._counter < len(self._labels):
            return self._labels[self._counter]
        return "Completed"

    @property
    def description(self):
        return self._description

    def __str__(self):
        done = ", ".join(self.completed_labels)
        sep = " | " if done else ""
        return (
            f"{self._description + ': ' if self._description else ''}"
            f"[{done}{sep}{self.current_label}]"
        )

    def update(self, iter_count, iter_dict=None, *, refresh=True):
        self._counter = iter_count
        if refresh:
            self.refresh()

    def refresh(self):
        width = shutil.get_terminal_size().columns
        line = str(self)[:width]
        sys.stderr.write("\r" + line + " " * max(0, width - len(line)))
        sys.stderr.flush()

    def reset(self):
        self._counter = 0

    def __exit__(self, *args):
        out = super().__exit__(*args)
        self.refresh()
        sys.stderr.write("\n")
        sys.stderr.flush()
        return out


class FileDisplay:
    """Use file which supports ANSI escape sequences as an updatable display.

    Reference: mici/progressbars.py:664-711.
    """

    CURSOR_UP = "\x1b[A"
    CURSOR_DOWN = "\x1b[B"

    def __init__(self, position=(0, 1), file=None):
        self._position = position
        self._file = file if file is not None else sys.stdout
        self._last_string_length = 0
        if self._position[0] == 0:
            self._file.write("\n" * self._position[1])
        self._file.flush()

    def _move_line(self, offset):
        self._file.write(
            self.CURSOR_DOWN * offset if offset >= 0
            else self.CURSOR_UP * -offset,
        )

    def update(self, string):
        self._move_line(self._position[0] - self._position[1])
        self._file.write(f"\r{string}")
        trailing_spaces = max(0, self._last_string_length - len(string))
        self._file.write(" " * trailing_spaces)
        self._last_string_length = len(string)
        self._move_line(self._position[1] - self._position[0])
        self._file.flush()


# The reference's cross-process proxy (mici/progressbars.py:712-752) is not
# needed — chains run inside a single compiled program — but the name is
# kept so reference user code importing it keeps working.
_ProxySequenceProgressBar = SequenceProgressBar
