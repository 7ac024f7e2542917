"""Pipeline stages: each exposes pure batch functions / callable classes
for ``Dataset.map_batches`` plus small helpers that wire a Dataset stage."""
