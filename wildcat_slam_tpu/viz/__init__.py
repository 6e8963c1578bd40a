"""Visualization export without a ROS dependency."""
