"""Large-scale training-data pipeline operators (beyond the reference's
surface; SURVEY §7 step 8): deduplication, similarity search, text
analysis, multimodal binary columns.
"""
