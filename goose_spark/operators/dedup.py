"""Placeholder — populated by the LLM-pipeline operator build step."""
