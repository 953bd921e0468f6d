"""Training: config, optimizer/scheduler, train step, checkpoints, loop."""
