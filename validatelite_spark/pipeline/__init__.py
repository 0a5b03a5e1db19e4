from validatelite_spark.pipeline.quality import PipelineConfig, QualityPipeline
from validatelite_spark.pipeline.pages import synthesize_pages

__all__ = ["QualityPipeline", "PipelineConfig", "synthesize_pages"]
