"""Large-scale training-data operations: deduplication, text analysis,
similarity search, multimodal plumbing — first-class components alongside
the CDC engine (SURVEY.md §2 extension set)."""
