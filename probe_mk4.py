import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_enable_x64", True)
import sys
sys.path.insert(0, "/root/repo")
from bench import measure_multichain, peeling_flops
for ch in (1, 4):
    v = measure_multichain("gtr_gamma", 1610, 2048, ch, 64)
    print(f"makona mc ch={ch}: {v:.2f} agg states/s, tflops={v*peeling_flops(1610,4,4,2048)/1e12:.3f}", flush=True)
