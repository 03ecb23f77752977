DELETE DATA { <urn:alice> <urn:knows> <urn:bob> }
