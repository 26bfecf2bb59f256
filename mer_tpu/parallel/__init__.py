from mer_tpu.parallel.pipeline import (
    make_pp_mesh,
    pipeline_apply,
    scanned_layer_pipeline,
    pipeline_param_sharding,
)
from mer_tpu.parallel.pp_forward import (
    audio_erc_logits_pp,
    roberta_hidden_pp,
    text_erc_logits_pp,
    wav2vec2_hidden_pp,
)
from mer_tpu.parallel.mesh import (
    batch_sharding,
    initialize_distributed,
    m2fnet_param_specs,
    make_mesh,
    mesh_from_config,
    pad_batch_to_dp,
    partition_spec_for,
    replicated,
    sequence_sharding,
    shard_params,
)

__all__ = [
    "pipeline_apply",
    "scanned_layer_pipeline",
    "pipeline_param_sharding",
    "make_pp_mesh",
    "text_erc_logits_pp",
    "audio_erc_logits_pp",
    "roberta_hidden_pp",
    "wav2vec2_hidden_pp",
    "make_mesh",
    "mesh_from_config",
    "batch_sharding",
    "replicated",
    "sequence_sharding",
    "m2fnet_param_specs",
    "partition_spec_for",
    "shard_params",
    "pad_batch_to_dp",
    "initialize_distributed",
]
