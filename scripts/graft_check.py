import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
import __graft_entry__ as g
fn, args = g.entry()
out = jax.jit(fn)(*args)
print("entry ok", jax.tree.leaves(out)[0].shape)
g.dryrun_multichip(8)
print("dryrun ok")
