"""Graceful-preemption support shared by the trainers.

SURVEY §5: the reference has NO failure handling — recovery is a manual
`--resume_checkpoint` (train/training_loop.py:110-141). Here SIGTERM/SIGINT
let the in-flight step finish, checkpoint at the step boundary, and flag the
loop to exit; resume picks up from the saved step."""
from __future__ import annotations

from motionstyle.train import logging as logger


class PreemptionMixin:
    """Adds install_preemption_handler()/restore_signal_handlers(); the
    training loop checks `self.preempted` at each step boundary."""

    preempted = False

    def install_preemption_handler(self, signals=None):
        """On SIGTERM/SIGINT the CURRENT step finishes, a checkpoint is
        written at the step boundary, and `self.preempted` turns True so the
        caller's loop can exit. Call restore_signal_handlers() once the loop
        exits so later signals kill the process normally again."""
        import signal as _signal

        self.preempted = False
        self._old_handlers = {}

        def _handler(signum, frame):
            logger.log(f"signal {signum}: checkpointing at next step boundary")
            self.preempted = True

        for s in signals or (_signal.SIGTERM, _signal.SIGINT):
            self._old_handlers[s] = _signal.signal(s, _handler)

    def restore_signal_handlers(self):
        import signal as _signal

        for s, h in getattr(self, "_old_handlers", {}).items():
            _signal.signal(s, h)
        self._old_handlers = {}
