"""Programmatic job-driver surface: submit / status / wait / cancel
with live per-superstep stats.

Reference: computer-driver/.../ComputerDriver.java (submitJob, waitJob,
cancelJob, JobObserver with onJobStateChanged) and JobStatus.java
(INITIALIZING / RUNNING / SUCCEEDED / FAILED / CANCELLED), plus the
superstep stats the master reports per iteration
(SuperstepStat.java, MasterService.java:240-288). The reference drives
a k8s cluster; here a job is a PregelRunner loop on the shared
SparkSession, so the driver runs it on a daemon thread and exposes the
same lifecycle:

- submit()      -> JobHandle (the reference's job id + observer)
- handle.status / superstep_stats — poll-able while running; stats are
  the runner's per-step metrics (rows, messages, seconds, aggregates)
- handle.wait(timeout) -> terminal JobStatus
- handle.cancel() — cooperative at every superstep boundary INCLUDING
  before superstep 0 (the runner polls the flag via should_stop, so a
  cancel issued immediately after submit executes zero supersteps) AND
  preemptive within one (sparkContext.cancelJobGroup interrupts the
  in-flight Spark jobs; each job thread tags its work with the job-id
  job group first).

Scale notes: the handle holds no data — state stays in the runner's
DataFrames; stats are O(supersteps) scalars. Multiple jobs can run
concurrently on one session (Spark's scheduler interleaves their
stages); job-group tagging keeps cancellation per-job.
"""

from __future__ import annotations

import threading
import uuid
from enum import Enum
from typing import Any

from hugegraph_computer_spark.engine.superstep import (
    PregelRunner,
    RunAborted,
    RunResult,
    VertexProgram,
)


class JobStatus(str, Enum):
    INITIALIZING = "INITIALIZING"
    RUNNING = "RUNNING"
    SUCCEEDED = "SUCCEEDED"
    FAILED = "FAILED"
    CANCELLED = "CANCELLED"

    @property
    def is_terminal(self) -> bool:
        return self in (
            JobStatus.SUCCEEDED,
            JobStatus.FAILED,
            JobStatus.CANCELLED,
        )


class JobCancelled(Exception):
    """Raised inside the job thread when cancel() interrupts the loop."""


class JobHandle:
    """One submitted job: lifecycle + live superstep stats."""

    def __init__(self, job_id: str, program: VertexProgram):
        self.job_id = job_id
        self.algorithm = program.name
        self._status = JobStatus.INITIALIZING
        self._stats: list[dict[str, Any]] = []
        self._lock = threading.Lock()
        self._done = threading.Event()
        self._cancel_requested = False
        self._result: RunResult | None = None
        self._error: BaseException | None = None
        self._sc = None  # set by the driver before the thread starts

    # -- observation ----------------------------------------------------
    @property
    def status(self) -> JobStatus:
        return self._status

    @property
    def superstep_stats(self) -> list[dict[str, Any]]:
        """Per-superstep metrics reported so far (copy; grows while
        RUNNING) — the SuperstepStat polling surface."""
        with self._lock:
            return list(self._stats)

    @property
    def result(self) -> RunResult | None:
        """The RunResult once SUCCEEDED, else None."""
        return self._result

    @property
    def error(self) -> BaseException | None:
        return self._error

    def wait(self, timeout: float | None = None) -> JobStatus:
        """Block until terminal (ComputerDriver.waitJob). Returns the
        status reached; on timeout returns the current (non-terminal)
        status."""
        self._done.wait(timeout)
        return self._status

    def cancel(self) -> None:
        """Request cancellation: flips the cooperative flag (checked at
        every superstep boundary) and cancels the job group so in-flight
        Spark stages die instead of running the superstep out."""
        self._cancel_requested = True
        if self._sc is not None:
            self._sc.cancelJobGroup(self.job_id)

    # -- internal -------------------------------------------------------
    def _on_superstep(self, metrics: dict[str, Any]) -> None:
        with self._lock:
            self._stats.append(metrics)
        if self._cancel_requested:
            raise JobCancelled(self.job_id)


class ComputerDriver:
    """submitJob / jobStatus / waitJob / cancelJob over one session."""

    def __init__(self) -> None:
        self._jobs: dict[str, JobHandle] = {}

    def submit(
        self,
        program: VertexProgram,
        g,
        runner: PregelRunner | None = None,
        resume_from: str | None = None,
    ) -> JobHandle:
        job_id = f"{program.name}-{uuid.uuid4().hex[:12]}"
        handle = JobHandle(job_id, program)
        handle._sc = g.vertices.sparkSession.sparkContext
        self._jobs[job_id] = handle

        def _run() -> None:
            # tag this thread's Spark jobs so cancel() reaches exactly
            # this job's stages (PYSPARK_PIN_THREAD keeps local
            # properties per Python thread)
            handle._sc.setJobGroup(
                job_id, f"{program.name} [{job_id}]", interruptOnCancel=True
            )
            handle._status = JobStatus.RUNNING
            try:
                # The runner polls the cancel flag BEFORE every superstep
                # (incl. superstep 0), so a cancel() issued right after
                # submit() — possibly before this thread even called
                # setJobGroup, when cancelJobGroup had nothing to kill —
                # still stops the job with zero supersteps executed.
                res = (runner or PregelRunner()).run(
                    program,
                    g,
                    resume_from=resume_from,
                    on_superstep=handle._on_superstep,
                    should_stop=lambda: handle._cancel_requested,
                )
                handle._result = res
                handle._status = JobStatus.SUCCEEDED
            except (JobCancelled, RunAborted):
                handle._status = JobStatus.CANCELLED
            except BaseException as e:  # noqa: BLE001 — job isolation
                if handle._cancel_requested:
                    # cancelJobGroup killed the in-flight action; that
                    # surfaces as a Py4J error, but the cause is cancel
                    handle._status = JobStatus.CANCELLED
                else:
                    handle._error = e
                    handle._status = JobStatus.FAILED
            finally:
                handle._done.set()

        threading.Thread(
            target=_run, name=f"hcs-job-{job_id}", daemon=True
        ).start()
        return handle

    # reference-parity id-keyed accessors (ComputerDriver.java surface)
    def job(self, job_id: str) -> JobHandle:
        return self._jobs[job_id]

    def job_status(self, job_id: str) -> JobStatus:
        return self._jobs[job_id].status

    def wait_job(self, job_id: str, timeout: float | None = None) -> JobStatus:
        return self._jobs[job_id].wait(timeout)

    def cancel_job(self, job_id: str) -> None:
        self._jobs[job_id].cancel()

    def jobs(self) -> dict[str, JobStatus]:
        return {jid: h.status for jid, h in self._jobs.items()}
