"""Diagnostic tools mirroring the reference's auxiliary binaries
(``src/bin/sgd_diagnostics.rs``, ``src/bin/measure_layout_quality.rs``,
``src/bin/compare_layouts.rs``).  Each is runnable as
``python -m gfasort_tpu.tools.<name> ...``."""
