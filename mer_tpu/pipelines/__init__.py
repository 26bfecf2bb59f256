from mer_tpu.pipelines.e2e import E2EModels, StreamingPipeline, mixed_utterance_batches

__all__ = ["E2EModels", "StreamingPipeline", "mixed_utterance_batches"]
