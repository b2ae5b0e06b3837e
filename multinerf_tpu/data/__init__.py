"""Data plane: ray/batch pytrees, cameras, dataset loaders."""
