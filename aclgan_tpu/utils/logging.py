"""Observability: scalar metric writer + HTML gallery.

The reference logs scalars by *reflection* over trainer attributes
(write_loss, utils.py:174-178) into tensorboardX. Here the jitted steps
return an explicit metrics dict — same scalar names — written to TensorBoard
event files (torch.utils.tensorboard, no TF dependency) and to a plain
`scalars.jsonl` so logs are greppable without TB.

write_html reproduces the self-refreshing gallery (utils.py:150-171).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict


class MetricWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def write(self, step: int, scalars: Dict[str, float]) -> None:
        rec = {"step": step, "time": time.time()}
        for name, value in scalars.items():
            value = float(value)
            rec[name] = value
            if self._tb is not None:
                self._tb.add_scalar(name, value, step)
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def _write_one_row_html(html_file, iterations: int, img_filename: str, all_size: int):
    # utils.py:139-147
    html_file.write("<h3>iteration [%d] (%s)</h3>" % (iterations, img_filename.split("/")[-1]))
    html_file.write(
        """
        <p><a href="%s">
          <img src="%s" style="width:%dpx">
        </a><br>
        <p>
        """ % (img_filename, img_filename, all_size)
    )


def write_html(filename: str, iterations: int, image_save_iterations: int,
               image_directory: str, all_size: int = 1536) -> None:
    """Self-refreshing gallery over saved grids (utils.py:150-171)."""
    with open(filename, "w") as html_file:
        html_file.write(
            """
    <!DOCTYPE html>
    <html>
    <head>
      <title>Experiment name = %s</title>
      <meta http-equiv="refresh" content="30">
    </head>
    <body>
    """ % os.path.basename(filename)
        )
        html_file.write("<h3>current</h3>")
        _write_one_row_html(html_file, iterations,
                            "%s/gen_a2b_train_current.jpg" % image_directory, all_size)
        for j in range(iterations, image_save_iterations - 1, -1):
            if j % image_save_iterations == 0:
                _write_one_row_html(html_file, j,
                                    "%s/gen_a2b_test_%08d.jpg" % (image_directory, j), all_size)
                _write_one_row_html(html_file, j,
                                    "%s/gen_a2b_train_%08d.jpg" % (image_directory, j), all_size)
        html_file.write("</body></html>")


def prepare_sub_folder(output_directory: str):
    """Create images/ + checkpoints/ under the run dir (utils.py:127-136)."""
    image_directory = os.path.join(output_directory, "images")
    checkpoint_directory = os.path.join(output_directory, "checkpoints")
    os.makedirs(image_directory, exist_ok=True)
    os.makedirs(checkpoint_directory, exist_ok=True)
    return checkpoint_directory, image_directory
