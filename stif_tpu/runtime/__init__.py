from stif_tpu.runtime.pipeline import InferencePipeline, pad_to_multiple, window_plan
from stif_tpu.runtime.chunked import ChunkedDecoder

__all__ = ["InferencePipeline", "pad_to_multiple", "window_plan", "ChunkedDecoder"]
