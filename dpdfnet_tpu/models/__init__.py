"""Model graphs: configs, parameters, state pytrees, functional forwards."""
