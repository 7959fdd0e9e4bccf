"""fluent_plugin_record_reformer_spark — a brand-new PySpark-native
parse → enrich → route → aggregate engine with the query semantics of
sonots/fluent-plugin-record-reformer (reference studied read-only at
/root/reference; cited as ``core.rb:NN`` in docstrings).

This is NOT a port: the reference is a per-row Ruby transform plugin;
here the same declarative transform specs compile once (driver-side)
into vectorized Spark ``Column`` expressions executed by Catalyst /
whole-stage codegen, over columnar tables of multi-turn agent
transcripts ``(conv_id, turn_idx, role, text, tool, ts)``.

Public API
----------
- :class:`~.plans.spec.TransformSpec` — declarative transform spec
  (the reference's fluentd ``<match>`` config, ``core.rb:31-83``).
- :class:`~.plans.compiler.ReformContext` — binds spec placeholders to
  physical columns (tag column, time column, hostname constant).
- :func:`~.operators.reform.reform` — apply a compiled spec to a
  DataFrame (the reference's ``reform``/``process``,
  ``core.rb:85-141``).
- :mod:`~.operators` — parse / enrich / route / aggregate / dedup /
  similarity / textstats stages.
- :mod:`~.sources.transcripts` — deterministic synthetic transcript
  table + derivation from the testdata ``events`` table.
"""

from .plans.spec import TransformSpec
from .plans.compiler import ReformContext
from .operators.reform import reform

__all__ = ["TransformSpec", "ReformContext", "reform"]
__version__ = "0.1.0"
