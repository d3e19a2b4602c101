"""(stub, populated later this round)"""
