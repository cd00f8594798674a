"""Dataset loaders, window datasets, scalers, time features."""
