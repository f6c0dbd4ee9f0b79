"""AOT-compile the bench selfplay segment for TPU and dump compiled HLO."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
os.makedirs("/root/repo/.jax_cache_hlo", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_hlo")

from katacoffee_tpu.game import GameConfig, init_state
from katacoffee_tpu.nn.configs import get_model_spec
from katacoffee_tpu.nn.model import CoffeeNet, init_params
from katacoffee_tpu.search import SearchParams, make_nn_eval_fn
from katacoffee_tpu.selfplay import SelfplaySettings, run_selfplay_segment

cfg = GameConfig(5, 5, 4)
sp = SearchParams.for_selfplay()
B = 512
model = CoffeeNet(get_model_spec("b6c96"), win_len=cfg.win_len)
params = init_params(model, cfg, jax.random.PRNGKey(0))
eval_fn = make_nn_eval_fn(cfg, model, params)
settings = SelfplaySettings(num_sims=600)
states = jax.vmap(lambda _: init_state(cfg))(jnp.arange(B))
ep = jnp.zeros((B,), jnp.int32)

seg = jax.jit(lambda s, e, r: run_selfplay_segment(
    cfg, sp, settings, eval_fn, s, e, r, 2))
t0 = time.time()
lowered = seg.lower(states, ep, jax.random.PRNGKey(0))
comp = lowered.compile()
print("compile", time.time() - t0, "s")
txt = comp.as_text()
with open("/root/repo/.scratch/seg_hlo.txt", "w") as f:
    f.write(txt)
print("HLO chars", len(txt))
