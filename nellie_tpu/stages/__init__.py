"""The seven pipeline stages as host drivers around jitted frame kernels."""
