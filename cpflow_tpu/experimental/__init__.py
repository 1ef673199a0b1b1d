"""Measured-and-rejected or in-progress alternatives, kept off the product
path. Nothing here is imported by the library; see each module's docstring
for the measurements that parked it."""
