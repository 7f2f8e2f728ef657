"""Pluggable metric-reporting platforms; parity: train/train_platforms.py.

TensorboardPlatform uses tensorboardX when available; ClearML is stubbed to a
no-op with a warning (no clearml in the image — same graceful degradation the
reference's optional import would need).
"""
from __future__ import annotations

import os


class TrainPlatform:
    def __init__(self, save_dir):
        pass

    def report_scalar(self, name, value, iteration, group_name=None):
        pass

    def report_args(self, args, name):
        pass

    def close(self):
        pass


class NoPlatform(TrainPlatform):
    pass


class TensorboardPlatform(TrainPlatform):
    def __init__(self, save_dir):
        from tensorboardX import SummaryWriter

        self.writer = SummaryWriter(log_dir=save_dir)

    def report_scalar(self, name, value, iteration, group_name=None):
        self.writer.add_scalar(f"{group_name}/{name}", value, iteration)

    def close(self):
        self.writer.close()


class ClearmlPlatform(TrainPlatform):
    def __init__(self, save_dir):
        try:
            from clearml import Task

            name = os.path.basename(os.path.normpath(save_dir)) or save_dir
            self.task = Task.init(project_name="motionstyle", task_name=name)
            self.logger = self.task.get_logger()
        except Exception as ex:  # degrade to no-op like the docstring says
            print(f"clearml unavailable ({type(ex).__name__}: {ex}); "
                  "falling back to NoPlatform behavior")
            self.task = None
            self.logger = None

    def report_scalar(self, name, value, iteration, group_name=None):
        if self.logger is not None:
            self.logger.report_scalar(title=group_name, series=name, iteration=iteration, value=value)

    def report_args(self, args, name):
        if self.task is not None:
            self.task.connect(args, name=name)

    def close(self):
        if self.task is not None:
            self.task.close()
