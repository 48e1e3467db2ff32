"""Dataset stage builders. Every stage is a function
`(ray.data.Dataset, ...) -> ray.data.Dataset` built from map_batches /
flat_map / groupby over Arrow batches; stateful stages are callable
classes run as actor pools. No stage calls ray.init().
"""
