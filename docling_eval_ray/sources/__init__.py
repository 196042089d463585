from .interleaved import read_interleaved_documents, synth_spans_for_doc  # noqa: F401
