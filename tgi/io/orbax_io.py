"""Orbax-backed checkpointing for training runs.

Production-tier alternative to the msgpack path in tgi/io/checkpoints.py:
versioned step directories with retention, suited to the GAN training
loop's periodic snapshots (training_loop.py:396-410's pickle snapshots).
"""

from __future__ import annotations

import os


def make_manager(directory: str, max_to_keep: int = 5):
    import orbax.checkpoint as ocp
    options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                           create=True)
    return ocp.CheckpointManager(os.path.abspath(directory), options=options)


def save_step(manager, step: int, state) -> bool:
    import orbax.checkpoint as ocp
    return manager.save(step, args=ocp.args.StandardSave(state))


def restore_latest(manager, template):
    """Restore the newest step into the structure of ``template``.
    Returns (state, step) or (None, None) when the directory is empty."""
    import orbax.checkpoint as ocp
    step = manager.latest_step()
    if step is None:
        return None, None
    state = manager.restore(step, args=ocp.args.StandardRestore(template))
    return state, step
