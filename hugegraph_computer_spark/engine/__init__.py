from hugegraph_computer_spark.engine.driver import (
    ComputerDriver,
    JobHandle,
    JobStatus,
)
from hugegraph_computer_spark.engine.superstep import (
    PregelRunner,
    RunAborted,
    RunResult,
    StepOutput,
    VertexProgram,
)

__all__ = [
    "ComputerDriver",
    "JobHandle",
    "JobStatus",
    "PregelRunner",
    "RunAborted",
    "RunResult",
    "StepOutput",
    "VertexProgram",
]
