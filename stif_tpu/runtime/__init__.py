from stif_tpu.runtime.pipeline import InferencePipeline, pad_to_multiple, window_plan

__all__ = ["InferencePipeline", "pad_to_multiple", "window_plan"]
