"""Run OUR refnerf-architecture train step alone on the chip.

Isolates whether the h2h refnerf failure is in our stack (the diag's
in-process UNIMPLEMENTED may have been stream poisoning from the complex
probes that ran before it in the same client).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'scripts'))

import jax

print('devices:', jax.devices(), flush=True)

import head_to_head as h2h
from multinerf_tpu.parallel import mesh as mesh_lib

arch = h2h.ARCHS['refnerf']
ours = h2h.build_ours(arch, 'dummy_specular', 100)
batch = next(ours['train_data'])
gbatch = mesh_lib.shard_batch_to_global(ours['mesh'], batch)
rng = jax.random.PRNGKey(0)
print('built; stepping', flush=True)
state, stats, rng = ours['train_pstep'](rng, ours['state'], gbatch, 0.5, 1.0)
print('ours refnerf step loss:', float(stats['loss']), flush=True)
state, stats, rng = ours['train_pstep'](rng, state, gbatch, 0.5, 1.0)
print('step 2 loss:', float(stats['loss']), flush=True)
