from .clip_flat import make_flat_loss_fn, make_flat_train_step, step_lr
from .cnzsl import CNZSLConfig, cnzsl_init, cnzsl_logits, make_cnzsl_train_step
from .free import (
    FREEConfig,
    free_init,
    make_free_steps,
    synthesize_features,
    train_softmax_classifier,
)
from .gcn import (
    Adjacency,
    GCNConfig,
    basic_edges,
    dense_edges,
    gcn_apply,
    gcn_init,
    make_gcn_train_step,
    masked_l2_loss,
)

__all__ = [
    "make_flat_loss_fn",
    "make_flat_train_step",
    "step_lr",
    "CNZSLConfig",
    "cnzsl_init",
    "cnzsl_logits",
    "make_cnzsl_train_step",
    "FREEConfig",
    "free_init",
    "make_free_steps",
    "synthesize_features",
    "train_softmax_classifier",
    "Adjacency",
    "GCNConfig",
    "basic_edges",
    "dense_edges",
    "gcn_apply",
    "gcn_init",
    "make_gcn_train_step",
    "masked_l2_loss",
]
