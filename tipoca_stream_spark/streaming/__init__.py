from tipoca_stream_spark.streaming.pipeline import CdcPipeline, CdcPipelineConfig
from tipoca_stream_spark.streaming.supervisor import LagMonitor, Supervisor

__all__ = ["CdcPipeline", "CdcPipelineConfig", "LagMonitor", "Supervisor"]
