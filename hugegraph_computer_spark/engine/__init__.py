from hugegraph_computer_spark.engine.superstep import (
    PregelRunner,
    RunResult,
    StepOutput,
    VertexProgram,
)

__all__ = ["PregelRunner", "RunResult", "StepOutput", "VertexProgram"]
