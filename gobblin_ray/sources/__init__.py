"""Source-side planning + readers (Gobblin Source/Extractor analogs)."""
