from controllora_tpu.serving.engine import BatchingEngine, Request

__all__ = ["BatchingEngine", "Request"]
