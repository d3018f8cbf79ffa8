"""Training subsystem: optimizers, dataset/epoch loop, model saver.

The reference's training stack is ggml-opt (ggml/src/ggml-opt.cpp: dataset
API, AdamW/SGD as in-graph ops, epoch loop with eval split) driven by
llama_opt_init/llama_opt_epoch (src/llama-context.cpp:2979-3129) and the
finetune tool (examples/training/finetune.cpp). The TPU-native inversion:
one jitted train step = forward + cross-entropy + grads + optimizer update
(XLA fuses the whole thing), scanned over batches; sharding comes from the
same NamedSharding rules as inference (tpullm.parallel).
"""
from .optimizer import adamw_init, adamw_step, sgd_step
from .loop import TrainConfig, Dataset, train, float_params
from .saver import save_model_gguf

__all__ = [
    "adamw_init", "adamw_step", "sgd_step",
    "TrainConfig", "Dataset", "train", "float_params",
    "save_model_gguf",
]
