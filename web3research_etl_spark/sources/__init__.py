"""Source adapters: wire formats the changelog tail can arrive in.

Each adapter decodes to the one canonical CHANGELOG_SCHEMA frame, so the
downstream pipeline (streaming/pipeline.py) is source-agnostic.
"""
