"""deepbinner_tpu — a TPU-native nanopore barcode demultiplexer.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of rrwick/Deepbinner
(see SURVEY.md): classify raw nanopore current signal into barcode bins with a
deep 1D CNN, straight from fast5 files, in real time if desired.

Reference parity map (rrwick/Deepbinner, reconstructed in SURVEY.md §2 — the
mount was empty at build time, so citations are file::function level):

- ``deepbinner/deepbinner.py::main``      → :mod:`deepbinner_tpu.cli.main`
- ``deepbinner/classify.py``              → :mod:`deepbinner_tpu.cli.classify` +
  :mod:`deepbinner_tpu.runner.executor` (compiled pipeline)
- ``deepbinner/bin.py``                   → :mod:`deepbinner_tpu.cli.bin_reads`
- ``deepbinner/realtime.py``              → :mod:`deepbinner_tpu.cli.realtime`
- ``deepbinner/prep.py``                  → :mod:`deepbinner_tpu.train.prep`
- ``deepbinner/balance.py``               → :mod:`deepbinner_tpu.train.balance`
- ``deepbinner/train_network.py``         → :mod:`deepbinner_tpu.train.trainer`
- ``deepbinner/network_architecture.py``  → :mod:`deepbinner_tpu.models.network`
- ``deepbinner/trim_signal.py``           → :mod:`deepbinner_tpu.ops.preprocess`
- ``deepbinner/load_fast5s.py``           → :mod:`deepbinner_tpu.utils.fast5`
- ``deepbinner/misc.py``                  → :mod:`deepbinner_tpu.utils.seqio`,
  :mod:`deepbinner_tpu.utils.log`

Heavy imports (jax, h5py) are deferred to the submodules so that pure host
subcommands (``bin``) never pay for them — mirroring the reference's lazy
subcommand imports.
"""

__version__ = "0.5.0"

# Public kit names, as in the reference CLI (--kit choices).
KITS = ("EXP-NBD103", "SQK-RBK004")

# Classes: index 0 = no barcode, 1..12 = barcode01..barcode12.
NUM_BARCODES = 12
NUM_CLASSES = NUM_BARCODES + 1
