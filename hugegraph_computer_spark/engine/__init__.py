from hugegraph_computer_spark.engine.driver import (
    ComputerDriver,
    JobHandle,
    JobStatus,
)
from hugegraph_computer_spark.engine.superstep import (
    PregelRunner,
    RunResult,
    StepOutput,
    VertexProgram,
)

__all__ = [
    "ComputerDriver",
    "JobHandle",
    "JobStatus",
    "PregelRunner",
    "RunResult",
    "StepOutput",
    "VertexProgram",
]
