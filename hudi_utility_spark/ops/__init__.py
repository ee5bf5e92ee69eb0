"""Large-scale data-pipeline operators (SURVEY §7 step 7 / north star):
deduplication, similarity search, text analysis, multimodal plumbing.
"""
