import os, time
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/mmpfn_jax_cache')
import jax, numpy as np, dataclasses
import jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
jax.config.update('jax_explain_cache_misses', True)

from multimodalpfn_tpu.datasets.synthetic import pad_ufes_like
from multimodalpfn_tpu.estimator.base import initialize_model
from multimodalpfn_tpu.models.transformer import forward_train_test
from multimodalpfn_tpu.train.finetune import create_val_data

t0 = time.time()
X, emb, y = pad_ufes_like(seed=0)
ntr = int(len(X) * 0.8)
X, emb, y = X[:ntr], emb[:ntr], y[:ntr]
loaded = initialize_model(model_path='random:0', which='classifier', static_seed=0,
                          mixer_type='MGM+CAP', mgm_heads=16, cap_heads=8, features_per_group=1)
cfg = loaded.config
cfg = dataclasses.replace(cfg, compute_dtype='bfloat16', use_flash=True, fused_ops=True)
params = loaded.params
jax.block_until_ready(params)
print('init_model s', round(time.time() - t0, 1))

rng = np.random.RandomState(0)
X_train, X_val, image_train, image_val, y_train, y_val = create_val_data(
    X=X, image=emb, y=y, rng=rng, is_classification=True)

def val_forward(p):
    return forward_train_test(
        p, cfg,
        jnp.asarray(X_train, jnp.float32)[None],
        jnp.asarray(np.asarray(y_train, np.float32))[None],
        jnp.asarray(X_val, jnp.float32)[None],
        jnp.asarray(image_train, jnp.float32)[None],
        jnp.asarray(image_val, jnp.float32)[None])

t0 = time.time()
lowered = jax.jit(val_forward).lower(params)
print('trace+lower s', round(time.time() - t0, 1))
t0 = time.time()
compiled = lowered.compile()
print('compile s', round(time.time() - t0, 1))
t0 = time.time()
out = np.asarray(compiled(params))
print('first run s', round(time.time() - t0, 1), out.shape)

t0 = time.time()
from multimodalpfn_tpu.models.loading import save_model
save_model('/tmp/probe_ft.ckpt', params, loaded.config,
           ckpt_config=loaded.ckpt_config, criterion_borders=loaded.criterion_borders)
print('save_snapshot s', round(time.time() - t0, 1))
