"""Date-spec planning: text spec → one partition-pruned window.

The reference accepts three spec shapes (reference report_engine.py:65-112;
docs/CONFIGURATION.md:42-46):

* ``dd_mm_yyyy``              — a single day
* ``"dd_mm_yyyy -> dd_mm_yyyy"`` — an inclusive range
* ``*mm_yyyy``                — a whole-month glob

and turns a range into **one Drill query per day** (otp/discovery/fi) or
per month-glob (stages), concatenating client-side — ~91 HTTP round-trips
for a 30-day report (SURVEY.md §3.3). Here every spec collapses to a single
``DateWindow`` that becomes ONE range predicate on a partitioned scan;
Catalyst partition pruning does the path selection the reference did by
string-building. This is the biggest architectural win over the reference
and it is O(1) in queries regardless of range length.
"""

from __future__ import annotations

import calendar
from dataclasses import dataclass
from datetime import date, datetime, timedelta


@dataclass(frozen=True)
class DateWindow:
    """Inclusive [start, end] day window."""

    start: date
    end: date

    def __post_init__(self) -> None:
        if self.start > self.end:
            raise ValueError(f"start {self.start} after end {self.end}")

    def days(self) -> list[date]:
        """Inclusive day list (reference `_date_range`, report_engine.py:65-74).

        Only used for compatibility path-listing; the engine itself uses a
        range predicate, never a per-day loop.
        """
        n = (self.end - self.start).days + 1
        return [self.start + timedelta(days=i) for i in range(n)]

    def month_prefixes(self) -> list[str]:
        """``mm_yyyy`` prefixes covered by the window (reference
        `_month_prefixes`, report_engine.py:77-86)."""
        out: list[str] = []
        cur = self.start.replace(day=1)
        while cur <= self.end:
            out.append(cur.strftime("%m_%Y"))
            # next month, first day
            cur = (cur + timedelta(days=32)).replace(day=1)
        return out


def _parse_day(text: str) -> date:
    return datetime.strptime(text.strip(), "%d_%m_%Y").date()


def parse_date_spec(spec: str, today: date | None = None) -> DateWindow:
    """Parse any reference date spec into an inclusive window.

    ``None``/empty → yesterday (the reference's cron default,
    run_reports.py:182-183).
    """
    if not spec or not spec.strip():
        today = today or date.today()
        y = today - timedelta(days=1)
        return DateWindow(y, y)
    spec = spec.strip()
    if "->" in spec:
        a, b = (part.strip() for part in spec.split("->", 1))
        return DateWindow(_parse_day(a), _parse_day(b))
    if spec.startswith("*"):
        # *mm_yyyy month glob → full-month window
        mm, yyyy = spec[1:].split("_", 1)
        month, year = int(mm), int(yyyy)
        last = calendar.monthrange(year, month)[1]
        return DateWindow(date(year, month, 1), date(year, month, last))
    d = _parse_day(spec)
    return DateWindow(d, d)
