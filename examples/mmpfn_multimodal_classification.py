"""Multimodal classification: tabular features + frozen image embeddings fused via
the MGM+CAP mixer (the reference's PAD-UFES-20 workflow, `mmpfn/run.py`)."""

import numpy as np

from multimodalpfn_tpu import MMPFNClassifier
from multimodalpfn_tpu.datasets.synthetic import toy_multimodal_classification
from multimodalpfn_tpu.train.finetune import fine_tune_mmpfn

X, emb, y = toy_multimodal_classification(n=200, n_classes=3, emb_dim=768, seed=0)
ntr = 160

# 1) briefly fine-tune the mixers on the downstream data (frozen input encoders)
fine_tune_mmpfn(
    mixer_type="MGM+CAP", mgm_heads=16, cap_heads=8, features_per_group=2,
    path_to_base_model="auto",  # or "random:0" without the published ckpt
    save_path_to_fine_tuned_model="checkpoints/finetuned_example.ckpt",
    finetuning_config={"learning_rate": 1e-5, "max_steps": 100},
    validation_metric="log_loss", task_type="multiclass",
    X_train=X[:ntr], image_train=emb[:ntr], y_train=y[:ntr], freeze_input=True,
)

# 2) fit/predict with the fine-tuned checkpoint
clf = MMPFNClassifier(
    model_path="checkpoints/finetuned_example.ckpt",
    mixer_type="MGM+CAP", mgm_heads=16, cap_heads=8, features_per_group=2,
)
clf.fit(X[:ntr], emb[:ntr], y[:ntr])
print("accuracy:", (clf.predict(X[ntr:], emb[ntr:]) == y[ntr:]).mean())
